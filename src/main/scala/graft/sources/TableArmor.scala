package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Schema armor for the driver-generated tables, in the spirit of
  * `EventReplay.normalizeTs`: testdata layouts have drifted across
  * driver generations before (the round-7 ts break took 17 queries
  * down), so the columns the operators assume are normalized at the
  * single load point — a NO-OP on the contract layout (conditional on
  * the actual type, so current plans are untouched), a cheap cast when
  * a future generator ships doc_id as INT32, n_chars as INT64-backed
  * INT32, or embeddings as DOUBLE[].
  */
object TableArmor {
  /** documents: doc_id/n_chars BIGINT, text/lang/source STRING. */
  def documents(df: DataFrame): DataFrame =
    castIf(castIf(df, "doc_id", LongType), "n_chars", LongType)

  /** embeddings: vec_id BIGINT, embedding ARRAY<FLOAT>, label INT. */
  def embeddings(df: DataFrame): DataFrame = {
    val ids = castIf(df, "vec_id", LongType)
    ids.schema.fields.find(_.name == "embedding").map(_.dataType) match {
      case Some(ArrayType(FloatType, _)) | None => ids
      case Some(ArrayType(_: NumericType, _)) =>
        ids.withColumn("embedding", col("embedding").cast(ArrayType(FloatType)))
      case Some(other) =>
        throw new IllegalArgumentException(s"unsupported embeddings.embedding type: $other")
    }
  }

  private def castIf(df: DataFrame, name: String, want: DataType): DataFrame =
    df.schema.fields.find(_.name == name).map(_.dataType) match {
      case None | Some(`want`) => df
      case Some(t) if t.isInstanceOf[NumericType] || t == StringType =>
        df.withColumn(name, col(name).cast(want))
      case Some(other) =>
        throw new IllegalArgumentException(s"unsupported $name type: $other")
    }
}
