package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Layout armor for documents/embeddings — the normalizeTs lesson
  * (EventsLayoutSpec) applied to the other driver tables: a future
  * testdata generation shipping INT32 ids, INT32 n_chars or DOUBLE[]
  * embeddings must normalize back to the contract at the load point,
  * and the contract layout must pass through untouched (same plan, no
  * gratuitous casts).
  */
class TableArmorSpec extends AnyFunSuite with SharedSpark {
  import graft.sources.TableArmor

  test("contract layouts pass through by reference") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert(TableArmor.documents(docs) eq docs)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assert(TableArmor.embeddings(emb) eq emb)
  }

  test("drifted documents layout (int ids, int n_chars) normalizes and still dedups") {
    import spark.implicits._
    val drifted = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("doc_id", col("doc_id").cast(IntegerType))
      .withColumn("n_chars", col("n_chars").cast(IntegerType))
    val armored = TableArmor.documents(drifted)
    assert(armored.schema("doc_id").dataType == LongType)
    assert(armored.schema("n_chars").dataType == LongType)
    // a representative consumer runs unchanged on the armored frame
    val viaDrifted = graft.operators.Dedup.exact(armored, "text", "doc_id")
      .agg(sum($"n_copies")).collect()(0).getLong(0)
    val viaContract = graft.operators.Dedup.exact(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), "text", "doc_id")
      .agg(sum($"n_copies")).collect()(0).getLong(0)
    assert(viaDrifted == viaContract)
  }

  test("drifted embeddings layout (double vectors) normalizes and scores identically") {
    val contract = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val drifted = contract
      .withColumn("embedding", col("embedding").cast(ArrayType(DoubleType)))
      .withColumn("vec_id", col("vec_id").cast(IntegerType))
    val armored = TableArmor.embeddings(drifted)
    assert(armored.schema("embedding").dataType == ArrayType(FloatType))
    assert(armored.schema("vec_id").dataType == LongType)
    val q = contract.filter(col("vec_id") < 2)
    val a = graft.operators.Similarity.topKCosine(armored, TableArmor.embeddings(q), k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val b = graft.operators.Similarity.topKCosine(contract, q, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(a == b)
  }

  test("unsupported drift fails loudly, not silently") {
    import spark.implicits._
    val bad = Seq((1L, Seq("x"))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] { TableArmor.embeddings(bad) }
    val badDoc = Seq((Seq(1), "t")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] { TableArmor.documents(badDoc) }
  }
}
