package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

import graft.text.{EnglishStemmer, Tokenize}

/** Session-level registration of the engine's scalar functions — the Spark
  * analog of the reference's extension entry point
  * (`/root/reference/src/lib.rs:80-87` registering into DuckDB's catalog).
  * All functions are deterministic (pure function of input + fixed bundled
  * dictionary), so Catalyst keeps filter/projection pushdown through them
  * legal.
  */
object GraftFunctions {

  /** `standardize_title(VARCHAR) → VARCHAR` (`/root/reference/src/lib.rs:72-78`).
    * NULL in → NULL out (the reference never defines NULL behavior — it reads
    * raw vectors without validity masks, `src/lib.rs:52-67`; NULL-propagation
    * is the SQL-standard choice). */
  val standardizeTitle: UserDefinedFunction =
    udf((s: String) => if (s == null) null else TitleStandardizer.standardize(s))

  /** Snowball-English stem of a single token. */
  val stemEn: UserDefinedFunction =
    udf((s: String) => if (s == null) null else EnglishStemmer.stem(Tokenize.asciiLower(s)))

  /** `\w+` tokenize + ASCII-lowercase (`/root/reference/src/utils.rs:43-50`). */
  val tokenizeUdf: UserDefinedFunction =
    udf((s: String) => if (s == null) null else Tokenize.tokenize(s))

  /** tokenize + stem in one pass. */
  val tokenizeStem: UserDefinedFunction =
    udf((s: String) => if (s == null) null else Tokenize.tokenizeAndStem(s))

  /** Sparse TF-IDF query vector against the dictionary vocabulary, as
    * term→weight (diagnostic / building block for similarity pipelines). */
  val tfidfVec: UserDefinedFunction = udf { (s: String) =>
    if (s == null) null
    else {
      val idx = TitleStandardizer.index
      val (ti, tv) = idx.queryVector(Tokenize.tokenizeAndStem(s))
      val inv = idx.idxToTerm // per-JVM lazy inverse, no per-row rebuild
      ti.indices.map(k => inv(ti(k)) -> tv(k)).toMap
    }
  }

  def standardize_title(c: Column): Column = standardizeTitle(c)

  def register(spark: SparkSession): Unit = {
    spark.udf.register("standardize_title", standardizeTitle)
    spark.udf.register("stem_en", stemEn)
    spark.udf.register("tokenize_words", tokenizeUdf)
    spark.udf.register("tokenize_stem", tokenizeStem)
    spark.udf.register("tfidf_vec", tfidfVec)
    // native codegen'd expressions on the SQL surface. standardize_title is
    // re-registered over the UDF: same semantics (both call
    // TitleStandardizer.standardize), minus the ScalaUDF encoder round-trip.
    graft.expressions.VectorExpressions.ensureRegistered(spark)
    graft.expressions.StandardizeTitleExpr.ensureRegistered(spark)
    graft.expressions.WordNGramsExpr.ensureRegistered(spark)
    graft.expressions.WordTokensExpr.ensureRegistered(spark)
  }
}
