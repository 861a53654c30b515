package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mirrors the reference's tests/directory/test_distinguishedname.py cases
  * exactly, plus the distributed Column layer. */
class DistinguishedNameSpec extends SparkSpec {
  import DistinguishedName._

  test("explode (reference test_explode: junk and empty values skipped)") {
    val exploded = explode("Well,number=10,and,othernumber=20,notanumber=,thirdnumber= ")
    assert(exploded == Seq("number" -> "10", "othernumber" -> "20", "thirdnumber" -> " "))
  }

  test("implode (reference test_implode: empty values kept)") {
    assert(implode(Seq("SubNetwork" -> "NL1_R", "Number" -> "17",
      "Empty" -> "", "UeRc" -> "9")) == "SubNetwork=NL1_R,Number=17,Empty=,UeRc=9")
  }

  test("splitParts honours escaped commas (reference test_splitparts)") {
    val parts = splitParts("SubNetwork=NL1_R,SubNetwork=AHPTUR1," +
      "MeContext=AHPTUR1,ManagedElement=1,RncFunction=1,UeRc=9")
    assert(parts.length == 6 && parts.head == "SubNetwork=NL1_R" && parts(5) == "UeRc=9")
    val esc = splitParts("Word=asdf,Writer=qwerty\\,dvorak,Reader=Unicode")
    assert(esc == Seq("Word=asdf", "Writer=qwerty\\,dvorak", "Reader=Unicode"))
  }

  test("escape/unescape (reference test_escape)") {
    assert(escape("Word=asdf,fdsa$2") == "Word=asdf\\,fdsa$2")
    assert(unescape(escape("a,b,c")) == "a,b,c")
  }

  test("entityTypeName (reference test_entity_type_name_from_dn)") {
    assert(entityTypeName("Network=Global,Node=001") == "Node")
  }

  test("Column layer matches driver-side semantics incl. escapes") {
    import spark.implicits._
    val df = Seq(
      "Network=Global,Node=001",
      "Word=asdf,Writer=qwerty\\,dvorak,Reader=Unicode"
    ).toDF("dn").select(
      col("dn"),
      splitPartsCol(col("dn")).as("parts"),
      entityTypeNameCol(col("dn")).as("etype"),
      entityNameCol(col("dn")).as("ename"),
      parentDnCol(col("dn")).as("parent"))
    val rows = df.collect()
    assert(rows(0).getSeq[String](rows(0).fieldIndex("parts")).toSeq == Seq("Network=Global", "Node=001"))
    assert(rows(0).getAs[String]("etype") == "Node")
    assert(rows(0).getAs[String]("ename") == "001")
    assert(rows(0).getAs[String]("parent") == "Network=Global")
    assert(rows(1).getSeq[String](rows(1).fieldIndex("parts")).toSeq ==
      Seq("Word=asdf", "Writer=qwerty\\,dvorak", "Reader=Unicode"))
    assert(rows(1).getAs[String]("parent") == "Word=asdf,Writer=qwerty\\,dvorak")
    // unescaped name of the escaped middle part
    val mid = Seq("Writer=qwerty\\,dvorak").toDF("dn")
      .select(entityNameCol(col("dn"))).head.getString(0)
    assert(mid == "qwerty,dvorak")
  }

  test("single-part DN has null parent") {
    import spark.implicits._
    val p = Seq("Node=001").toDF("dn").select(parentDnCol(col("dn"))).head
    assert(p.isNullAt(0))
  }
}
