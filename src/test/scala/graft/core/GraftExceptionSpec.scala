package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The typed error taxonomy mirrors the reference's exception translation
  * (integration_tests/storage/trend/test_error.py:19-79): raw engine
  * errors surface as NoSuchPart / NoSuchColumn / TypeMismatch /
  * DuplicateTrendStore, and library throw-sites use the taxonomy
  * directly. */
class GraftExceptionSpec extends SparkSpec {
  import spark.implicits._

  test("translate: missing table -> NoSuchPartException") {
    val e = intercept[Throwable] {
      GraftError.translated { spark.sql("SELECT 1 FROM `non-existing-table`") }
    }
    assert(e.isInstanceOf[NoSuchPartException], e.getClass.toString)
  }

  test("translate: missing column -> NoSuchColumnException") {
    val df = Seq((1, "a")).toDF("id", "name")
    df.createOrReplaceTempView("gx_test")
    val e = intercept[Throwable] {
      GraftError.translated {
        spark.sql("SELECT `non-existing-column` FROM gx_test")
      }
    }
    assert(e.isInstanceOf[NoSuchColumnException], e.getClass.toString)
  }

  test("translate: invalid cast under ANSI -> TypeMismatchException") {
    val saved = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      val e = intercept[Throwable] {
        GraftError.translated {
          Seq("first").toDF("id").select(col("id").cast("int")).collect()
        }
      }
      assert(e.isInstanceOf[TypeMismatchException], e.getClass.toString)
    } finally spark.conf.set("spark.sql.ansi.enabled", saved)
  }

  test("translate: duplicate table -> DuplicateTrendStoreException") {
    spark.sql("DROP TABLE IF EXISTS gx_dup")
    spark.sql("CREATE TABLE gx_dup(id INT) USING parquet")
    try {
      val e = intercept[Throwable] {
        GraftError.translated {
          spark.sql("CREATE TABLE gx_dup(id INT) USING parquet")
        }
      }
      assert(e.isInstanceOf[DuplicateTrendStoreException], e.getClass.toString)
    } finally spark.sql("DROP TABLE IF EXISTS gx_dup")
  }

  test("unrecognized errors pass through untranslated") {
    val boom = new RuntimeException("boom")
    val e = intercept[RuntimeException] { GraftError.translated { throw boom } }
    assert(e eq boom)
  }

  test("library throw-sites use the taxonomy: every subtype is still an " +
      "IllegalArgumentException (pre-existing catch sites keep working)") {
    // direct sites retrofitted this round
    val cms = intercept[NoSuchPartException] {
      graft.functions.CountMin.estimateStored(
        new graft.storage.PartStore(spark, graft.storage.PartStoreConfig(
          "target/tmp/gx_none", 64L, keyCols = Seq("r", "bucket"))),
        "nope", Seq("a").toDF("tok"), "tok")
    }
    assert(cms.isInstanceOf[IllegalArgumentException])
    assert(cms.getMessage == "no CMS store at nope") // message unchanged
    assert((new ConcurrentWriterException("x")).isInstanceOf[IllegalArgumentException])
    assert((new TypeMismatchException("x")).isInstanceOf[IllegalArgumentException])
  }
}
