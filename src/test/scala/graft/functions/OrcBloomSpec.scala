package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ORC bloom-filter probe. The pinned fixture was written by Spark's
  * OWN ORC writer (`orc.bloom.filter.columns`); the cross-engine
  * test re-writes a fresh same-options file in THIS suite run and
  * asserts identical kernel behavior — 8/8 written values answering
  * true through the from-spec Murmur3-64 + Kirsch–Mitzenmacher
  * double hashing validates every constant. */
class OrcBloomSpec extends SparkSpec {

  private val fixtureHex =
    "4f52430a061204080850000a1f0a030000001218080822120a066e616d" +
    "652d3012066e616d652d37186050000a950608041a9006000000000000" +
    "0000000000000000000000000000000000000000020000000000000000" +
    "0000000000000080000000000000000000000000000000000000000000" +
    "0000000000000000000000000000000000000000000008000000000000" +
    "0000000400000000000000000200000000000000000000000000000000" +
    "0000000000000000000000000000000000008000000000000000000000" +
    "0214080000000000000000000000000000000000000000000000000000" +
    "0000000000040000000000000000000000000000000000000000000000" +
    "0000000000000000000000000000000000000000000000000000000000" +
    "0000000000080000000000000000000000000000000000800000000000" +
    "0004000000000000000000000000000000000000000000000000000000" +
    "0000000000000000000000000000000000000000000000000000000000" +
    "0000000000000000000000000000000000000000000000000000000000" +
    "0000000000000000000000000014000000000000000002000000200000" +
    "0000000000000000000000000000000000000000000000000000000000" +
    "0000000000000000000000000000002000000000000000000000000000" +
    "0000000200000000000000000000000000000000000000000000000000" +
    "0000000000000000000000000000000000000000000000000000000000" +
    "0001000000800000000000000000000000000000000000000000000000" +
    "0000000000000100000000000000000000000000000000000000000000" +
    "0080000000000000000000000000000000000000000000000004000000" +
    "0000000000000000000000004000080000000000000000000000000000" +
    "0000000000000010000000000000000000000000000000000000000000" +
    "0000000000000000000000000100000000000000000000000000000000" +
    "0000000000000000000000000000000000000000000000000000000000" +
    "0000000000001000000000000000000000000000000000000000000000" +
    "0000000000000000000002000000000000000000000000000000000000" +
    "0000000000000000400000000000000000000000000000000a120a0200" +
    "00120c080812060800100e183850006e616d652d306e616d652d316e61" +
    "6d652d326e616d652d336e616d652d346e616d652d356e616d652d366e" +
    "616d652d370506c00700020a060806100018080a060806100118210a07" +
    "080810011898060a060806100218140a060801100118300a0608021001" +
    "18020a0608011002180412020800120408021801120208020a320a0408" +
    "0850000a1a080822120a066e616d652d3012066e616d652d3718605000" +
    "58320a0e080812060800100e183850005804080310d5071a0b080310d5" +
    "061836204728082210080c120201021a046e616d651a02696422250807" +
    "3a210a17737061726b2e73716c2e636174616c7973742e747970651206" +
    "737472696e67220208042a210a186f72672e6170616368652e73706172" +
    "6b2e76657273696f6e1205342e312e3230083a04080850003a1a080822" +
    "120a066e616d652d3012066e616d652d371860500058323a0e08081206" +
    "0800100e18385000580440e807480058016205322e322e3208b4011000" +
    "2202000c2834300982f403034f524314"

  private def hx(h: String): Array[Byte] =
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("pinned ORC fixture: written values true, absent false, " +
    "no-bloom column and unknown column null") {
    val b = hx(fixtureHex)
    for (i <- 0 until 8)
      assert(OrcBloom.check(b, "name", s"name-$i".getBytes) ===
        java.lang.Boolean.TRUE, s"name-$i")
    for (i <- 8 until 14)
      assert(OrcBloom.check(b, "name", s"name-$i".getBytes) ===
        java.lang.Boolean.FALSE, s"name-$i")
    assert(OrcBloom.check(b, "id", "3".getBytes) == null)
    assert(OrcBloom.check(b, "missing", "x".getBytes) == null)
  }

  test("cross-engine, reproducible: a FRESH file from Spark's own " +
    "ORC writer behaves identically (validates the Murmur3 path)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("orcbloomfx")
      .toFile.getAbsolutePath
    (0 until 8).map(i => (s"name-$i", i.toLong)).toDF("name", "id")
      .coalesce(1).write
      .option("orc.bloom.filter.columns", "name")
      .option("orc.bloom.filter.fpp", "0.05")
      .option("orc.row.index.stride", "1000")
      .option("compression", "none")
      .mode("overwrite").orc(dir)
    val part = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".orc")).head
    val b = java.nio.file.Files.readAllBytes(part.toPath)
    for (i <- 0 until 8)
      assert(OrcBloom.check(b, "name", s"name-$i".getBytes) ===
        java.lang.Boolean.TRUE, s"fresh name-$i")
  }

  test("zlib-compressed footers decode through the chunk framing") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("orcbloomz")
      .toFile.getAbsolutePath
    (0 until 8).map(i => (s"name-$i", i.toLong)).toDF("name", "id")
      .coalesce(1).write
      .option("orc.bloom.filter.columns", "name")
      .option("orc.row.index.stride", "1000")
      .option("compression", "zlib")
      .mode("overwrite").orc(dir)
    val part = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".orc")).head
    val b = java.nio.file.Files.readAllBytes(part.toPath)
    for (i <- 0 until 8)
      assert(OrcBloom.check(b, "name", s"name-$i".getBytes) ===
        java.lang.Boolean.TRUE, s"zlib name-$i")
  }

  test("the column expression distributes the probe per row") {
    import spark.implicits._
    val b = hx(fixtureHex)
    val df = (0 until 14).map(i => (i.toLong, s"name-$i"))
      .toDF("id", "probe")
      .withColumn("payload", lit(b))
      .withColumn("hit",
        OrcBloom.mightContain(col("payload"), "name", col("probe")))
    val got = df.orderBy("id").collect().map(r => r.getBoolean(3))
    assert(got.take(8).forall(identity) && got.drop(8).forall(!_))
  }

  test("fail-closed: corruption, truncation, junk answer null") {
    val b = hx(fixtureHex)
    val flip = b.clone()
    // stomp the postscript's tail: the protobuf walk must refuse
    for (k <- 2 to 7)
      flip(flip.length - k) = 0xFF.toByte
    assert(OrcBloom.check(flip, "name", "name-0".getBytes) == null)
    assert(OrcBloom.check(b.take(60), "name", "x".getBytes) == null)
    assert(OrcBloom.check("ORCjunk".getBytes, "name", "x".getBytes) == null)
    assert(OrcBloom.check(Array[Byte](), "name", "x".getBytes) == null)
  }
}
