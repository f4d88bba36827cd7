package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions registering graft's native expressions as SQL
  * functions (`SELECT dot_product(a, b) ...`). Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      GraftExtensions.builder))
    ext.injectFunction((
      FunctionIdentifier("simhash16"),
      new ExpressionInfo(classOf[SimhashPack].getName, "simhash16"),
      GraftExtensions.simhashBuilder))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimhashPack].getName, "simhash64"),
      GraftExtensions.simhash64Builder))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinhashSig].getName, "minhash_sig"),
      GraftExtensions.minhashBuilder))
    ext.injectFunction((
      FunctionIdentifier("repetition_stats"),
      new ExpressionInfo(classOf[RepetitionStats].getName, "repetition_stats"),
      GraftExtensions.repetitionBuilder))
    ext.injectFunction((
      FunctionIdentifier("csv_fields"),
      new ExpressionInfo(classOf[CsvFields].getName, "csv_fields"),
      GraftExtensions.csvFieldsBuilder))
    ext.injectFunction((
      FunctionIdentifier("ws_tokens"),
      new ExpressionInfo(classOf[WsTokens].getName, "ws_tokens"),
      GraftExtensions.wsTokensBuilder))
    ext.injectFunction((
      FunctionIdentifier("script_tokens"),
      new ExpressionInfo(classOf[ScriptTokens].getName, "script_tokens"),
      GraftExtensions.scriptTokensBuilder))
    ext.injectFunction((
      FunctionIdentifier("shingle_set"),
      new ExpressionInfo(classOf[ShingleSet].getName, "shingle_set"),
      GraftExtensions.shingleSetBuilder))
    ext.injectFunction((
      FunctionIdentifier("token_ngrams"),
      new ExpressionInfo(classOf[TokenNgrams].getName, "token_ngrams"),
      GraftExtensions.tokenNgramsBuilder))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      GraftExtensions.nfcNormalizeBuilder))
    ext.injectFunction((
      FunctionIdentifier("fix_mojibake"),
      new ExpressionInfo(classOf[FixMojibake].getName, "fix_mojibake"),
      GraftExtensions.fixMojibakeBuilder))
    ext.injectFunction((
      FunctionIdentifier("mojibake_rounds"),
      new ExpressionInfo(classOf[MojibakeRounds].getName, "mojibake_rounds"),
      GraftExtensions.mojibakeRoundsBuilder))
    ext.injectFunction((
      FunctionIdentifier("utf8_stats"),
      new ExpressionInfo(classOf[Utf8Stats].getName, "utf8_stats"),
      GraftExtensions.utf8StatsBuilder))
  }
}

object GraftExtensions {
  private val builder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, "dot_product takes exactly 2 arguments")
    DotProduct(children(0), children(1))
  }
  private val simhashBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 1, "simhash16 takes exactly 1 argument")
    SimhashPack(children(0), 16)
  }
  private val simhash64Builder: Seq[Expression] => Expression = { children =>
    require(children.size == 1, "simhash64 takes exactly 1 argument")
    SimhashPack(children(0), 64)
  }
  // shingle width / signature count arrive as SQL int literals
  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  private val minhashBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 3, "minhash_sig(tokens, shingleN, k)")
    MinhashSig(children(0), intLit(children(1), "shingleN"), intLit(children(2), "k"))
  }
  private val repetitionBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, "repetition_stats(tokens, shingleN)")
    RepetitionStats(children(0), intLit(children(1), "shingleN"))
  }
  private val csvFieldsBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, "csv_fields takes exactly 2 arguments")
    CsvFields(children(0), children(1))
  }
  private val wsTokensBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 1, "ws_tokens takes exactly 1 argument")
    WsTokens(children(0))
  }
  private val scriptTokensBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 1, "script_tokens takes exactly 1 argument")
    ScriptTokens(children(0))
  }
  private val shingleSetBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2 || children.size == 3,
      "shingle_set(tokens, n[, hashHexLen])")
    ShingleSet(children(0), intLit(children(1), "n"),
      if (children.size == 3) intLit(children(2), "hashHexLen") else 0)
  }
  private val tokenNgramsBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, "token_ngrams(tokens, n)")
    TokenNgrams(children(0), intLit(children(1), "n"))
  }
  private val nfcNormalizeBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 1, "nfc_normalize takes exactly 1 argument")
    NfcNormalize(children(0))
  }
  private val fixMojibakeBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 1, "fix_mojibake takes exactly 1 argument")
    FixMojibake(children(0))
  }
  private val mojibakeRoundsBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 1, "mojibake_rounds takes exactly 1 argument")
    MojibakeRounds(children(0))
  }
  private val utf8StatsBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 1, "utf8_stats takes exactly 1 argument")
    Utf8Stats(children(0))
  }

  /** Register into an already-running session (extensions via
    * `withExtensions`/`spark.sql.extensions` only apply to new ones).
    * `dot_product` lands as a native expression; `vector_mean` is the
    * Aggregator surface (§2.10 UDAF registration — partial aggregation
    * and map-side combine come from the Aggregator contract). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("dot_product", builder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("simhash16", simhashBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("simhash64", simhash64Builder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("minhash_sig", minhashBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("repetition_stats", repetitionBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("csv_fields", csvFieldsBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("ws_tokens", wsTokensBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("script_tokens", scriptTokensBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("shingle_set", shingleSetBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("token_ngrams", tokenNgramsBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("nfc_normalize", nfcNormalizeBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("fix_mojibake", fixMojibakeBuilder, "built-in")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("mojibake_rounds", mojibakeRoundsBuilder, "built-in")
    implicit val inEnc: org.apache.spark.sql.Encoder[Array[Float]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]()
    spark.udf.register("vector_mean",
      org.apache.spark.sql.functions.udaf(new VectorMean))
  }
}
