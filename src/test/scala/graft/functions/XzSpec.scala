package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The xz/LZMA2 kernel graded against the REAL format: every pinned
  * stream below is stock `xz` CLI output embedded as constants,
  * covering all four check types, uncompressed and LZMA chunks, a
  * multi-chunk block with state CONTINUATION (reset=0) across the
  * 2 MiB chunk boundary, multi-block streams with declared sizes,
  * concatenated streams, the zero-block empty stream, and a
  * fail-closed battery. */
class XzSpec extends SparkSpec {
  import spark.implicits._

  private def un(hex: String): Array[Byte] =
    hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def sha256(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)
      .map("%02x".format(_)).mkString

  private val tarXz =
    "fd377a585a000004e6d6b44604c0ab01805021011c000000000000004b13c6e4" +
    "e027ff00a35d00399c8886149685f33dbbc1b8e035d2368bae41e3c38ed17c37" +
    "5f76a979e44ff0dd44324d398d06101f85d54b9bcbc58e60767e9284c3d7518e" +
    "cc822c183721a0cdc4404705b8419c4f5463c5d711f3149ff82abc11cec647eb" +
    "f3d45b767bb291370889ac4f62347f19b7e4d077e4ace11261fc91eec0fcb1fd" +
    "a655fc4065201de29dd46700aeb5c25a9e5e87bb6405abe0e5d2004c45e054ad" +
    "b825ca8da1f305af66000000c5f03995c927dfbc0001c70180500000ea4b3d73" +
    "b1c467fb020000000004595a"

  private val helloXz =
    "fd377a585a000004e6d6b44604c0141021011c00000000000000000088b06708" +
    "01000f68656c6c6f207a73746420776f726c64002edac54b4bc56ebf00013010" +
    "bc9377e21fb6f37d010000000004595a"
  private val helloCrc32 =
    "fd377a585a0000016922de3604c0141021011c00000000000000000088b06708" +
    "01000f68656c6c6f207a73746420776f726c64004f5d34bd00012c10e1ce0004" +
    "9042990d010000000001595a"
  private val helloSha =
    "fd377a585a00000ae1fb0ca104c0141021011c00000000000000000088b06708" +
    "01000f68656c6c6f207a73746420776f726c6400f12338dce3e079ebfabc93f5" +
    "744d25c22415eebd2eab93a3c42205f35910c7050001481042609105189b4b9a" +
    "01000000000a595a"
  private val helloNone =
    "fd377a585a000000ff12d94104c0141021011c00000000000000000088b06708" +
    "01000f68656c6c6f207a73746420776f726c640000012810e50b6c6006729e7a" +
    "010000000000595a"
  private val eightXz =
    "fd377a585a000004e6d6b44603c0fa02d80421010c00000018058b1ee0025701" +
    "725d003398484b97da0e5aa8f9d8b25ea45dee2d1fa401406e049eafb171f1a8" +
    "d283aefa1350c77722cff9b12fa3bd431fca7a1378d3119e637a9d5a6ea6951c" +
    "04d30bb38f651ad78af7e5958e8da0f14e36fd23ce809d00be2be59120efdd44" +
    "dc90b13d046727a31ba0553bbf9da6c26ccd77c50906bea7b05b5542262b0952" +
    "aa0b4454ad306bb624da5c256cf6d436f1573fdbe5985535e7ae171ec43ad5f6" +
    "b910cde38361d337532e18042bdb502cd10057f2c64ee349c6ad84b039b88bf3" +
    "72e8aa6925cdeb6a99fe312ad912af8f5331cf82728a3fe2a0672ecb17bd858d" +
    "f9775ad0a839a59dae92ba191f080b8ee3aa76e9e8140376275fe9c78d71976a" +
    "81e11831c434309bb1eaee9730ee3cb5b1edfb18e22d540beea3a257a64ec3c8" +
    "be33100a725c3d4800c4087ecd0dda1883b4eea67030df7bebc825950a360714" +
    "91703524e94b8cab256ae399ea634342dc3e072682d5f7a140db3f0fd6f93fde" +
    "0f0630af6c05652b731152eb8508ad860aeacd17820000001ffca13e71b37698" +
    "00019203d8040000ef20b230b1c467fb020000000004595a"
  private val concatXz =
    "fd377a585a000004e6d6b44604c0141021011c00000000000000000088b06708" +
    "01000f68656c6c6f207a73746420776f726c64002edac54b4bc56ebf00013010" +
    "bc9377e21fb6f37d010000000004595afd377a585a000004e6d6b44604c013af" +
    "0221011c0000000000000000a73a5e9ce0012e000b5d0030effbb7c18f116a77" +
    "7b2000006e07dc10f470b2ac00012faf02000000f2a3d16db1c467fb02000000" +
    "0004595a"
  private val xrunXz =
    "fd377a585a000004e6d6b44604c077e0a71221011000000000000000c30766ac" +
    "e493df006f5d003c6ffbbffea3b15ee5f83fb2aa2655f868704170150f8dfd1e" +
    "4c1b8a42b719f4691871ae66238a8a4d2fa30dd97fa6e38c231153e05918c575" +
    "8ae277f8b6947f0c6ac0de744964e2e95c53b204d8f7440cab5f0d6d46e9e5c3" +
    "7688b79657acb64de1691d6ffb4b88106c358c40c10000006e07c98fe4cd7178" +
    "00019301e0a712008ee37b17b1c467fb020000000004595a"
  private val emptyXz =
    "fd377a585a000004e6d6b446000000001cdf44211fb6f37d010000000004595a"
  private val runs2bXz =
    "fd377a585a000004e6d6b44603c00e800121011c000000008393521ee0007f00" +
    "065d0030eed600000000000082ff44dfd04f60a203c00e800121011c00000000" +
    "8393521ee0007f00065d0030eed600000000000082ff44dfd04f60a203c0122f" +
    "21011c0000000000d48f4e34e0002e000a5d0030ee2e65371952680000000000" +
    "0bc4dddce81880cf00032680012680012a2f000061aca87914173b3003000000" +
    "0004595a"
  private val big3mXz =
    "fd377a585a000004e6d6b44604c08904c08db7012101160000000000515ace80" +
    "ffff1a01775d0038184b01ef30f802732c49b8e511121d37e6fc749271ceec4c" +
    "2089a1609906ffa4cdc27bf3364ac67942c3e364c7ad0db7f08a3c784aaf13e4" +
    "4489ca89d0af6c94c35ad0b90bafc776edef62fea58c51df15cd51dc8b0bc02d" +
    "8b0ca0ddacefcd442c98c45b20e0582bc55e51a2e7bbd578e5f4017ddc9dc006" +
    "984d98fdd8afd5900fc42553f8f591363105a5b0ee6fc1704d470cd19111aaad" +
    "601dbaceb127185c5986e9665258bee976ac59e4e55b0508f9c7daadfcfb522b" +
    "74cd1e5b2042f9dd533df82964093b80cb2a6cdfb53bf0c4bd2e5faa0f3e4b66" +
    "4290130eff1093f8717859f80bcdff9528460fa9fc7cdefb9a302e56c08f85f3" +
    "8381c065c42553f8f591363105a5b0ee6fc1704d470cd19111aaad601dbaceb1" +
    "27185c5986e9665258bee976ac59e4e55b0508f9c7daadfcfb522b74cd1e5b20" +
    "42f9dd533df82964093b80cb2a6cdfb53bf0c4bd2e5faa0f3e4b664290130eff" +
    "1093f8717859f80bcdff9528460fa9fc7cdefb9a302e56c08f85d9a3d5588dc7" +
    "a4008400ec7353a7fdbeae7c311a9fb78d316e709ea7235fec28cb85d195988a" +
    "7e2a91f22775f719c006984d98fdd8afd5900fc42553f8f591363105a5b0ee6f" +
    "c1704d470cd19111aaad601dbaceb127185c5986e9665258bee976ac59e4e55b" +
    "0508f9c7daadfcfb522b74cd1e5b2042f9dd533df82964093b80cb2a6cdfb53b" +
    "f0c4bd11c860660000000000785f26f5862722d20001a504c08db7017c9c273c" +
    "b1c467fb020000000004595a"
  private val wikiXz =
    "fd377a585a000004e6d6b44604c022d80421011c000000000000000059403d82" +
    "e00257001a5d003b9a49b20601a21c0a62a3eeafb0a5ffe33d4fb914734cfb00" +
    "00000000520007283a836d5c00013ed804000000cf11c2cbb1c467fb02000000" +
    "0004595a"

  test("xz: stock-CLI reference streams round-trip under all four " +
    "check types (crc64 default, crc32, sha256, none), uncompressed " +
    "and LZMA chunks, multi-block, concatenated and empty streams") {
    assert(new String(XzPayload.compute(un(helloXz), 1 << 20), "UTF-8")
      == "hello zstd world")
    assert(new String(XzPayload.compute(un(helloCrc32), 1 << 20), "UTF-8")
      == "hello zstd world")
    assert(new String(XzPayload.compute(un(helloSha), 1 << 20), "UTF-8")
      == "hello zstd world")
    assert(new String(XzPayload.compute(un(helloNone), 1 << 20), "UTF-8")
      == "hello zstd world")
    assert(new String(XzPayload.compute(un(wikiXz), 1 << 20), "UTF-8")
      == "wiki dump text " * 40)
    // real LZMA chunk over the 600-byte a..h text (sha-pinned)
    val eight = XzPayload.compute(un(eightXz), 1 << 20)
    assert(eight != null && eight.length == 600 && sha256(eight) ==
      "bcc3c6f1d3abee18a401e7fdc2a8d660f1bbc55bb20f802ec4a9fc8687367a70")
    // 300 KB of 'x' through the match machinery
    val xr = XzPayload.compute(un(xrunXz), 1 << 20)
    assert(xr != null && xr.length == 300000 && xr.forall(_ == 'x'))
    // two-block stream (declared sizes enforced per block)
    assert(new String(XzPayload.compute(un(runs2bXz), 1 << 20), "UTF-8")
      == "a" * 300 + "end")
    // concatenated streams decode back-to-back
    assert(new String(XzPayload.compute(un(concatXz), 1 << 20), "UTF-8")
      == "hello zstd world" + "a" * 300 + "end")
    // the empty stream (zero blocks, index only)
    assert(XzPayload.compute(un(emptyXz), 1 << 20).length == 0)
  }

  test("xz: a multi-chunk LZMA2 block (3 MB regenerated) crosses the " +
    "2 MiB chunk boundary with STATE CONTINUATION (reset=0)") {
    val got = XzPayload.compute(un(big3mXz), 4 << 20)
    assert(got != null, "multi-chunk block failed to decode")
    assert(got.length == 3000000)
    val want = ("pattern-x " * 300000).getBytes("UTF-8")
    assert(java.util.Arrays.equals(got, want))
  }

  test("xz fails closed: bad magic, corrupt payload bytes, every " +
    "truncation cut, doctored check, over-cap, trailing garbage, " +
    "non-LZMA2 filters refused; Column API with nulls") {
    val ok = un(wikiXz)
    val badMagic = ok.clone(); badMagic(0) = 'X'.toByte
    assert(XzPayload.compute(badMagic, 1 << 20) == null)
    for (cut <- 1 until ok.length)
      assert(XzPayload.compute(ok.take(cut), 1 << 20) == null,
        s"truncated at $cut")
    for (i <- 12 until ok.length) {
      val c = ok.clone(); c(i) = (c(i) ^ 0x55).toByte
      assert(XzPayload.compute(c, 1 << 20) == null, s"corrupt at $i")
    }
    // over-cap: rejected, never clipped
    assert(XzPayload.compute(un(xrunXz), 1 << 16) == null)
    assert(XzPayload.compute(un(xrunXz), 300000) != null)
    // trailing garbage after a valid stream
    assert(XzPayload.compute(un(helloXz) ++ Array[Byte](1, 2, 3),
      1 << 20) == null)
    // stream padding BETWEEN streams is fine, must be 4-aligned
    assert(new String(XzPayload.compute(
      un(helloXz + "00000000" + runs2bXz), 1 << 20), "UTF-8")
      == "hello zstd world" + "a" * 300 + "end")
    assert(XzPayload.compute(un(helloXz + "0000"), 1 << 20) == null)
    val rows = Seq((1L, un(helloXz)), (2L, null: Array[Byte]),
      (3L, "not xz".getBytes("UTF-8")))
      .toDF("id", "x")
      .select(col("id"), XzPayload(col("x")).cast("string").as("t"))
      .orderBy("id").collect()
    assert(rows(0).getString(1) == "hello zstd world")
    assert(rows(1).isNullAt(1) && rows(2).isNullAt(1))
  }

  test("tarXzList: a real .tar.xz (python-tarfile ustar + stock xz) " +
    "lists and extracts through the composed kernels") {
    import spark.implicits._
    val df = Seq((1L, un(tarXz))).toDF("doc_id", "payload")
    val rows = graft.ext.Multimodal.tarXzList(df)
      .orderBy("entry_idx").collect()
    assert(rows.map(r => (r.getString(2), r.getLong(4))).toSeq ==
      Seq(("src/main.py", 27L), ("README.md", 19L)))
    // corrupt xz: the whole archive vanishes (no rows)
    val bad = un(tarXz); bad(40) = (bad(40) ^ 1).toByte
    assert(graft.ext.Multimodal.tarXzList(
      Seq((1L, bad)).toDF("doc_id", "payload")).count() == 0)
  }
}
