package graft.functions

import org.apache.spark.sql.SparkSession

/**
 * SQL registration of graft's native expressions, so the `spark.sql`
 * surface (the strict superset of Kibana's query surface, SURVEY.md §2.3)
 * can call them by name alongside the built-ins:
 *
 * {{{
 *   GraftFunctions.register(spark)
 *   spark.sql("SELECT cosine_similarity(a.embedding, b.embedding) ...")
 * }}}
 */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("cosine_similarity",
      exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
    registry.createOrReplaceTempFunction("simhash32",
      exprs => SimHash32(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction("word_shingles",
      exprs => WordShingles(exprs.head,
        exprs(1).eval().asInstanceOf[Int]), "scala_udf")
    registry.createOrReplaceTempFunction("confluent_avro_decode",
      exprs => {
        val schema = exprs(1).eval().toString
        graft.ingest.ConfluentAvroDecode(exprs.head,
          Map(1 -> schema), schema)
      }, "scala_udf")
  }
}
