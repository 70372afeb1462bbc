package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.SparkSession

/** Custom Catalyst analyzer rule (SURVEY §2.10): the true Spark
  * analog of the reference's AST `node_remapper` registry
  * (`connemara_python/connemara/sqlparser/remappers.py:98-119` —
  * `RangeVar`/`ColumnRef` schema rewriting) — full SQL against source
  * schema names resolves against the consolidated target schemas.
  *
  * `SELECT … FROM public.customer` → `FROM <db>_public.customer`,
  * driven by `spark.graft.schemaMap` =
  * `"public=srcdb_public,s2=srcdb_s2"`. Registered through
  * [[GraftExtensions]] (`spark.sql.extensions=graft.plans.GraftExtensions`).
  */
final class SchemaRemapRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def mapping: Map[String, String] =
    spark.conf.getOption("spark.graft.schemaMap")
      .map(_.split(",").flatMap { kv =>
        kv.split("=", 2) match {
          case Array(k, v) if k.nonEmpty && v.nonEmpty => Some(k.trim -> v.trim)
          case _ => None
        }
      }.toMap)
      .getOrElse(Map.empty)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val m = mapping
    if (m.isEmpty) plan
    else plan.resolveOperatorsUp {
      case u: UnresolvedRelation if u.multipartIdentifier.length == 2 &&
          m.contains(u.multipartIdentifier.head) =>
        u.copy(multipartIdentifier =
          Seq(m(u.multipartIdentifier.head), u.multipartIdentifier(1)))
    }
  }
}

/** `SparkSessionExtensions` entry point: the schema-remap analyzer
  * rule plus the engine's native SQL functions. */
final class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(session => new SchemaRemapRule(session))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("pg_array_parse"),
      PgArrayParseExpression.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "pg_array_parse takes one argument")
        PgArrayParseExpression(children.head)
      }))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"),
      CosineSimExpression.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "cosine_sim takes two arguments")
        CosineSimExpression(children.head, children(1))
      }))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("char_mask"),
      CharMaskExpression.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "char_mask takes one argument")
        CharMaskExpression(children.head)
      }))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("word_shingles"),
      WordShinglesExpression.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "word_shingles takes (text, n)")
        WordShinglesExpression(children.head, intLit(children(1), "word_shingles n"))
      }))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("simhash_md5"),
      SimHashMd5Expression.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "simhash_md5 takes one argument")
        SimHashMd5Expression(children.head)
      }))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("dhash_md5"),
      DHashMd5Expression.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "dhash_md5 takes one argument")
        DHashMd5Expression(children.head)
      }))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("positioned_grams"),
      PositionedGramsExpression.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "positioned_grams takes (text, n)")
        PositionedGramsExpression(children.head,
          intLit(children(1), "positioned_grams n"))
      }))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("hashed_gram_buckets"),
      HashedGramBucketsExpression.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 3,
          "hashed_gram_buckets takes (text, dim, bigrams)")
        val bi = children(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Boolean, _) => v
          case other => throw new IllegalArgumentException(
            s"hashed_gram_buckets bigrams must be a BOOLEAN literal, got $other")
        }
        HashedGramBucketsExpression(children.head,
          intLit(children(1), "hashed_gram_buckets dim"), bi)
      }))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("cdc_chunks"),
      CdcChunksExpression.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 4,
          "cdc_chunks takes (text, window, divisor, useMd5)")
        val md5 = children(3) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Boolean, _) => v
          case other => throw new IllegalArgumentException(
            s"cdc_chunks useMd5 must be a BOOLEAN literal, got $other")
        }
        CdcChunksExpression(children.head,
          intLit(children(1), "cdc_chunks window"),
          intLit(children(2), "cdc_chunks divisor"), md5)
      }))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("winnow_fingerprints"),
      WinnowFingerprintsExpression.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 3, "winnow_fingerprints takes (text, k, w)")
        WinnowFingerprintsExpression(children.head,
          intLit(children(1), "winnow_fingerprints k"),
          intLit(children(2), "winnow_fingerprints w"))
      }))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("nfc_normalize"),
      NfcNormalizeExpression.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "nfc_normalize takes one argument")
        NfcNormalizeExpression(children.head)
      }))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("char_bits"),
      CharBitsExpression.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "char_bits takes one argument")
        CharBitsExpression(children.head)
      }))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("dot_long"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DotLongExpression].getName, "dot_long"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "dot_long takes two arguments")
        DotLongExpression(children.head, children(1))
      }))
  }

  private def intLit(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an INT literal, got $other")
  }
}
