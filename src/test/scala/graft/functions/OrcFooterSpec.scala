package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

class OrcFooterSpec extends SparkSpec {
  import spark.implicits._

  private def onePartBytes(write: String => Unit): Array[Byte] = {
    val dir = Files.createTempDirectory("graft-orc").toFile
    write(dir.toString)
    val part = dir.listFiles().filter(_.getName.endsWith(".orc")).head
    Files.readAllBytes(part.toPath)
  }

  test("orc_meta reads Spark's OWN orc output, zlib and uncompressed: " +
    "exact rows, stripes, top-level columns") {
    for (codec <- Seq("zlib", "none")) {
      val bytes = onePartBytes { dir =>
        spark.range(0, 2000).selectExpr(
            "id", "cast(id as string) as name", "cast(id as double) as x")
          .coalesce(1).write.mode("overwrite")
          .option("compression", codec).orc(dir)
      }
      val r = OrcFooterMeta.compute(bytes, 1 << 24)
      assert(r != null, codec)
      assert(r.getUTF8String(0).toString == codec.replace("none", "none")
        || r.getUTF8String(0).toString == codec)
      assert(r.getLong(2) == 2000L, s"num_rows under $codec")
      assert(r.getInt(3) >= 1)
      val cols = r.getArray(5)
      val got = (0 until cols.numElements()).map { i =>
        val c = cols.getStruct(i, 2)
        c.getUTF8String(0).toString -> c.getUTF8String(1).toString
      }
      assert(got == Seq("id" -> "long", "name" -> "string",
        "x" -> "double"), s"columns under $codec")
    }
  }

  test("orc_meta: unsupported codec yields postscript facts with null " +
    "footer fields; corrupt tails fail closed; Column API + sniff") {
    val zstd = onePartBytes { dir =>
      spark.range(0, 10).coalesce(1).write.mode("overwrite")
        .option("compression", "zstd").orc(dir)
    }
    val rz = OrcFooterMeta.compute(zstd, 1 << 24)
    assert(rz != null && rz.getUTF8String(0).toString == "zstd")
    assert(rz.isNullAt(2) && rz.isNullAt(5),
      "codec the JDK lacks: explicit refusal, not a guess")
    val ok = onePartBytes { dir =>
      spark.range(0, 10).coalesce(1).write.mode("overwrite")
        .option("compression", "none").orc(dir)
    }
    assert(OrcFooterMeta.compute(ok, 1 << 24) != null)
    val noHead = ok.clone(); noHead(0) = 'X'
    assert(OrcFooterMeta.compute(noHead, 1 << 24) == null)
    val noTailMagic = ok.clone()
    // the postscript's trailing magic sits just before the length byte
    noTailMagic(ok.length - 2) = 'X'
    assert(OrcFooterMeta.compute(noTailMagic, 1 << 24) == null)
    assert(OrcFooterMeta.compute(ok.take(ok.length / 2), 1 << 24) == null)
    assert(OrcFooterMeta.compute("ORCjunk".getBytes, 1 << 24) == null)
    val row = Seq((1L, ok)).toDF("doc_id", "payload")
      .select(graft.ext.Multimodal.sniffFormat(col("payload")).as("fmt"),
        graft.ext.Multimodal.orcMeta(col("payload"))
          .getField("num_rows").as("n")).collect()(0)
    assert(row.getString(0) == "orc" && row.getLong(1) == 10L)
  }
}
