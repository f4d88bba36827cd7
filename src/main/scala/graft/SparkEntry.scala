package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.catalog.SchemaCatalog
import graft.ext.{ChatData, CodeCorpus, Corpus, Dedup, Eval, Multimodal, PrefData, Similarity, TextAnalysis}
import graft.ops.{TreeWalk, Writers}
import graft.streaming.EventStreams

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` exercises one operator family from
  * SURVEY.md §2; `oracleSql` carries the equivalent ANSI SQL the driver
  * runs in DuckDB over the same parquet tables. Column names and
  * orderings are aligned on both sides; money arithmetic goes through
  * DECIMAL(18,4) before summing so Spark's partition-order-dependent
  * double summation cannot diverge from DuckDB's.
  */
object SparkEntry {

  /** Flagship: the copy-tree walk (reference's core operation) on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_copy_tree")(spark, "/root/testdata/sf0.001")

  // exact money arithmetic: double → decimal before aggregation
  private def dec(c: Column): Column = c.cast("decimal(18,4)")
  private def dbl(c: Column): Column = c.cast("double")

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** q286 fixture: pyarrow (parquet-cpp-arrow 16.1.0) parquet
    * files pinned as constants - cross-writer coverage for the
    * footer kernel (the unit suite covers parquet-mr via Spark's
    * own writer). Flat: 2 columns x 7 rows, 1 row group. Nested:
    * int32 + struct + optional string, 3 rows, 2 row groups. */
  private val pqFlatHex: String =
    "5041523115041570154C4C150E15001200003800000D0100010D0800020D" +
    "0800030D0800040D083C0500000000000000060000000000000015001516" +
    "151A2C150E1510150615061C180806000000000000001808000000000000" +
    "0000160028080600000000000000180800000000000000000000000B2802" +
    "0000000E01030388C61A2684021C1504193500061019180269641502160E" +
    "169C0216FC01267026081C18080600000000000000180800000000000000" +
    "001600280806000000000000001808000000000000000000192C15041500" +
    "1502001500151015020000001504155415484C150E15001200002A140200" +
    "00006E3005060031050600320506003305063034020000006E3502000000" +
    "6E3615001516151A2C150E1510150615061C360028026E3618026E300000" +
    "000B28020000000E01030388C61A26F4041C150C19350006101918046E61" +
    "6D651502160E16C00116B80126A00426BC031C360028026E3618026E3000" +
    "192C150415001502001500151015020000001504193C3500180673636865" +
    "6D61150400150425021802696400150C250218046E616D6525004C1C0000" +
    "00160E191C192C2684021C1504193500061019180269641502160E169C02" +
    "16FC01267026081C18080600000000000000180800000000000000001600" +
    "280806000000000000001808000000000000000000192C15041500150200" +
    "15001510150200000026F4041C150C19350006101918046E616D65150216" +
    "0E16C00116B80126A00426BC031C360028026E3618026E3000192C150415" +
    "0015020015001510150200000016DC03160E260816B403140000191C180C" +
    "4152524F573A736368656D6118EC012F2F2F2F2F36674141414151414141" +
    "414141414B41417741426741464141674143674141414141424241414D41" +
    "414141434141494141414142414149414141414241414141414941414142" +
    "454141414142414141414E542F2F2F384141414546454141414142774141" +
    "414145414141414141414141415141414142755957316C41414141414151" +
    "414241414541414141454141554141674142674148414177414141415141" +
    "424141414141414141454345414141414277414141414541414141414141" +
    "4141414941414142705A4141414341414D41416741427741494141414141" +
    "414141415541414141413D001820706172717565742D6370702D6172726F" +
    "772076657273696F6E2031362E312E30192C1C00001C0000000502000050" +
    "415231"

  private val pqNestedHex: String =
    "504152311504151015144C15041500120000081C01000000020000001500" +
    "151215162C15041510150615061C18040200000018040100000016002804" +
    "02000000180401000000000000092002000000040101030226A8011C1502" +
    "19350006101918016B1502160416980116A001263826081C180402000000" +
    "180401000000160028040200000018040100000000192C15041500150200" +
    "1500151015020000001504150C15104C1502150012000006140200000065" +
    "6E1500151215162C15041510150615061C36002802656E1802656E000000" +
    "092002000000040201040026BA031C150C19350006101928046D65746104" +
    "6C616E67150216041674167C26EA0226BE021C36002802656E1802656E00" +
    "192C150415001502001500151015020000001504151015144C1502150012" +
    "0000081C000000000000F83F1500151215162C15041510150615061C1808" +
    "000000000000F83F1808000000000000F83F16002808000000000000F83F" +
    "1808000000000000F83F00000009200200000004020104002680061C150A" +
    "19350006101928046D6574610573636F72651502160416B80116C00126F0" +
    "0426C0041C1808000000000000F83F1808000000000000F83F1600280800" +
    "0000000000F83F1808000000000000F83F00192C15041500150200150015" +
    "1015020000001504150A150E4C1502150012000005100100000078150015" +
    "1215162C15041510150615061C3602280178180178000000092002000000" +
    "030201020026C2081C150C19350006101918036F707415021604166E1676" +
    "26F60726CC071C360228017818017800192C150415001502001500151015" +
    "0200000015041508150C4C15021500120000040C03000000150015121516" +
    "2C15021510150615061C1804030000001804030000001600280403000000" +
    "180403000000000000092002000000020101020026D00A1C150219350006" +
    "101918016B1502160216900116980126E00926B8091C1804030000001804" +
    "03000000160028040300000018040300000000192C150415001502001500" +
    "151015020000001504150C15104C15021500120000061402000000656E15" +
    "00151215162C15021510150615061C36002802656E1802656E0000000920" +
    "02000000020201020026E60C1C150C19350006101928046D657461046C61" +
    "6E67150216021674167C26960C26EA0B1C36002802656E1802656E00192C" +
    "150415001502001500151015020000001504151015144C15021500120000" +
    "081C000000000000F83F1500151215162C15021510150615061C18080000" +
    "00000000F83F1808000000000000F83F16002808000000000000F83F1808" +
    "000000000000F83F000000092002000000020201020026AC0F1C150A1935" +
    "0006101928046D6574610573636F72651502160216B80116C001269C0E26" +
    "EC0D1C1808000000000000F83F1808000000000000F83F16002808000000" +
    "000000F83F1808000000000000F83F00192C150415001502001500151015" +
    "020000001504150015024C15001500120000001500150E15122C15021510" +
    "150615061C360200000007180200000002000026D2111C150C1935000610" +
    "1918036F7074150216021654165A26961126F8101C360200192C15041500" +
    "1502001500151015020000001504196C35001806736368656D6115060015" +
    "02250218016B00350218046D657461150400150C250218046C616E672500" +
    "4C1C000000150A2502180573636F726500150C250218036F707425004C1C" +
    "0000001606192C194C26A8011C150219350006101918016B150216041698" +
    "0116A001263826081C180402000000180401000000160028040200000018" +
    "040100000000192C1504150015020015001510150200000026BA031C150C" +
    "19350006101928046D657461046C616E67150216041674167C26EA0226BE" +
    "021C36002802656E1802656E00192C150415001502001500151015020000" +
    "002680061C150A19350006101928046D6574610573636F72651502160416" +
    "B80116C00126F00426C0041C1808000000000000F83F1808000000000000" +
    "F83F16002808000000000000F83F1808000000000000F83F00192C150415" +
    "0015020015001510150200000026C2081C150C19350006101918036F7074" +
    "15021604166E167626F60726CC071C360228017818017800192C15041500" +
    "15020015001510150200000016B2041604260816D204140000194C26D00A" +
    "1C150219350006101918016B1502160216900116980126E00926B8091C18" +
    "0403000000180403000000160028040300000018040300000000192C1504" +
    "150015020015001510150200000026E60C1C150C19350006101928046D65" +
    "7461046C616E67150216021674167C26960C26EA0B1C36002802656E1802" +
    "656E00192C1504150015020015001510150200000026AC0F1C150A193500" +
    "06101928046D6574610573636F72651502160216B80116C001269C0E26EC" +
    "0D1C1808000000000000F83F1808000000000000F83F1600280800000000" +
    "0000F83F1808000000000000F83F00192C15041500150200150015101502" +
    "00000026D2111C150C19350006101918036F7074150216021654165A2696" +
    "1126F8101C360200192C1504150015020015001510150200000016900416" +
    "0226B80916AE04140200191C180C4152524F573A736368656D6118A0032F" +
    "2F2F2F2F7A414241414151414141414141414B4141774142674146414167" +
    "4143674141414141424241414D4141414143414149414141414241414941" +
    "4141414241414141414D414141444D414141414C41414141415141414142" +
    "512F2F2F2F41414142425241414141415541414141424141414141414141" +
    "414144414141416233423041486A2F2F2F39302F2F2F2F41414142445267" +
    "414141416741414141424141414141494141414249414141414641414141" +
    "415141414142745A58526841414141414B6A2F2F2F2B6B2F2F2F2F414141" +
    "424178414141414163414141414241414141414141414141464141414163" +
    "324E76636D554142674149414159414267414141414141416744552F2F2F" +
    "2F4141414242524141414141634141414142414141414141414141414541" +
    "414141624746755A77414141414145414151414241414141424141464141" +
    "49414159414277414D414141414541415141414141414141424168414141" +
    "414163414141414241414141414141414141424141414161774141414167" +
    "414441414941416341434141414141414141414567414141410018207061" +
    "72717565742D6370702D6172726F772076657273696F6E2031362E312E30" +
    "194C1C00001C00001C00001C000000B304000050415231"

  /** q292 fixture: pyarrow (parquet-cpp-arrow 16.1.0) parquet with
    * TWO row groups (row_group_size=4 over 7 rows), snappy codec,
    * three columns (id int64 with one null, name string with one
    * null, score double) - every per-chunk statistic known by
    * construction. */
  private val pqStatsHex: String =
    "504152311504154015384C15081500120000200401000901000209074000" +
    "030000000000000004000000000000001500151415182C15081510150615" +
    "061C18080400000000000000180801000000000000001600280804000000" +
    "00000000180801000000000000000000000A240200000008010203E40026" +
    "EE011C1504193500061019180269641502160816EA0116E601265C26081C" +
    "180804000000000000001808010000000000000016002808040000000000" +
    "00001808010000000000000000192C150415001502001500151015020000" +
    "001504153415384C150615001200001A6405000000616C70686104000000" +
    "626574610500000064656C74611500151415182C15081510150615061C36" +
    "02280564656C74611805616C7068610000000A2402000000030B02032400" +
    "26D8041C150C19350006101918046E616D651502160816AA0116B20126FA" +
    "0326A6031C3602280564656C74611805616C70686100192C150415001502" +
    "0015001510150200000015041530152C4C15061500120000180000050104" +
    "F83F0507280002C00000000000000E401500151415182C15081510150615" +
    "061C18080000000000000E40180800000000000002C01602280800000000" +
    "00000E40180800000000000002C00000000A240200000003070203240026" +
    "BE071C150A193500061019180573636F72651502160816DA0116DA0126AC" +
    "0626E4051C18080000000000000E40180800000000000002C01602280800" +
    "00000000000E40180800000000000002C000192C15041500150200150015" +
    "1015020000001504152015244C15041500120000103C0600000000000000" +
    "07000000000000001500151215162C15061510150615061C180807000000" +
    "000000001808060000000000000016022808070000000000000018080600" +
    "000000000000000000092002000000030601030226D00A1C150419350006" +
    "1019180269641502160616C80116D00126C0092680091C18080700000000" +
    "000000180806000000000000001602280807000000000000001808060000" +
    "000000000000192C150415001502001500151015020000001504152C1530" +
    "4C15061500120000165403000000657073040000007A6574610300000065" +
    "74611500151415182C15061510150615061C360028047A65746118036570" +
    "730000000A240200000006010203240026B00D1C150C1935000610191804" +
    "6E616D6515021606169C0116A40126D80C268C0C1C360028047A65746118" +
    "0365707300192C1504150015020015001510150200000015041530152C4C" +
    "15061500120000180000050104E03F050728002240000000000000F0BF15" +
    "00151415182C15061510150615061C180800000000000022401808000000" +
    "000000F0BF1600280800000000000022401808000000000000F0BF000000" +
    "0A24020000000601020324002690101C150A193500061019180573636F72" +
    "651502160616DA0116DA0126FE0E26B60E1C180800000000000022401808" +
    "000000000000F0BF1600280800000000000022401808000000000000F0BF" +
    "00192C150415001502001500151015020000001504194C35001806736368" +
    "656D61150600150425021802696400150C250218046E616D6525004C1C00" +
    "0000150A2502180573636F726500160E192C193C26EE011C150419350006" +
    "1019180269641502160816EA0116E601265C26081C180804000000000000" +
    "001808010000000000000016002808040000000000000018080100000000" +
    "00000000192C1504150015020015001510150200000026D8041C150C1935" +
    "0006101918046E616D651502160816AA0116B20126FA0326A6031C360228" +
    "0564656C74611805616C70686100192C1504150015020015001510150200" +
    "000026BE071C150A193500061019180573636F72651502160816DA0116DA" +
    "0126AC0626E4051C18080000000000000E40180800000000000002C01602" +
    "28080000000000000E40180800000000000002C000192C15041500150200" +
    "15001510150200000016EE041608260816F204140000193C26D00A1C1504" +
    "193500061019180269641502160616C80116D00126C0092680091C180807" +
    "000000000000001808060000000000000016022808070000000000000018" +
    "08060000000000000000192C1504150015020015001510150200000026B0" +
    "0D1C150C19350006101918046E616D6515021606169C0116A40126D80C26" +
    "8C0C1C360028047A657461180365707300192C1504150015020015001510" +
    "15020000002690101C150A193500061019180573636F72651502160616DA" +
    "0116DA0126FE0E26B60E1C180800000000000022401808000000000000F0" +
    "BF1600280800000000000022401808000000000000F0BF00192C15041500" +
    "15020015001510150200000016BE04160626800916CE04140200191C180C" +
    "4152524F573A736368656D6118B8022F2F2F2F2F2B414141414151414141" +
    "414141414B41417741426741464141674143674141414141424241414D41" +
    "414141434141494141414142414149414141414241414141414D41414142" +
    "34414141414F414141414151414141436B2F2F2F2F414141424178414141" +
    "414163414141414241414141414141414141464141414163324E76636D55" +
    "4142674149414159414267414141414141416744552F2F2F2F4141414242" +
    "524141414141634141414142414141414141414141414541414141626D46" +
    "745A51414141414145414151414241414141424141464141494141594142" +
    "77414D414141414541415141414141414141424168414141414163414141" +
    "414241414141414141414141434141414161575141414167414441414941" +
    "416341434141414141414141414641414141414141414141413D3D001820" +
    "706172717565742D6370702D6172726F772076657273696F6E2031362E31" +
    "2E30193C1C00001C00001C000000D903000050415231"

  /** q287 fixture: pyarrow (ORC_CPP) orc files pinned as
    * constants - cross-writer coverage for the tail kernel (the
    * unit suite covers the Java orc-core writer via Spark). All
    * hold (id int64, name string) x 5 rows in one stripe, one per
    * codec: uncompressed, zlib, snappy, lz4, zstd. */
  private val orcPlainHex: String =
    "4F52430A061204080550000A120A020000120C0805120608001008181450" +
    "000A150A03000000120E080522080A0161120165180E5000C00400024204" +
    "6640616262636464650A060806100018080A060806100118140A06080610" +
    "0218170A060801100118040A060802100218040A06080110021807120408" +
    "0010001204080210001204080210001A03474D540A240A04080550000A0C" +
    "0805120608001008181450000A0E080522080A0161120165180E50000803" +
    "1089011A0A08031033180F204728052216080C120201021A0269641A046E" +
    "616D65200028003000220808042000280030002208080720002800300030" +
    "053A04080550003A0C0805120608001008181450003A0E080522080A0161" +
    "120165180E500040904E48016205322E302E30086F100018808004220200" +
    "0C2826300682F403034F524317"

  private val orcZlibHex: String =
    "4F52431100000A061204080550002B00000A130A03000000120C08051206" +
    "0800100818145000300000E312E762650001213E0E56250E2EC64421C654" +
    "09BE000600090000C0040002090000420466400F00006162626364646564" +
    "0000E362E360136090E0E602D18C1212609A49421A483302F9EC409A09C8" +
    "07D18C409A4B8885834180014832C148296677DF10004D00000A240A0408" +
    "0550000A0C0805120608001008181450000A0E080522080A016112016518" +
    "0E5000C80000E36016E86694E2E26016B093905030D5605512E3E0116262" +
    "649262CA4C9162C94BCC4D5560D060306050E2E06081B3D8212C03562B16" +
    "0ED600062B1E0E5621360E06010E0911208F8F835589838B315188315582" +
    "2F80C161829F076312AB919E819E010008671001188080042202000C2829" +
    "300682F403034F524317"

  private val orcSnappyHex: String =
    "4F52431100000A061204080550002B00000A130A03000000120C08051206" +
    "08001008181450003300000A170A050000000000120E080522080A016112" +
    "0165180E5000090000C0040002090000420466400F000061626263646465" +
    "860000471C0A0608061000180B05080801181805084002181C0A06080110" +
    "0118070A060802100205086C011002180A12040800100012040802100012" +
    "04080210001A03474D544D00000A240A04080550000A0C08051206080010" +
    "08181450000A0E080522080A0161120165180E5000D000006FB00803109D" +
    "011A0A0803103F1818204628052216080C120201021A0269641A046E616D" +
    "6520002800300022080804150A0007090AC430053A04080550003A0C0805" +
    "120608001008181450003A0E080522080A0161120165180E500040904E48" +
    "016205322E302E30086B1002188080042202000C2829300682F403034F52" +
    "4317"

  private val orcZstdHex: String =
    "4F52431100000A061204080550002B00000A130A03000000120C08051206" +
    "0802100A181E50003300000A170A050000000000120E080522080A016112" +
    "016518125000090000C004020209000042046E4013000061616261626364" +
    "64658F00000A0608061000180B0A060806100118180A0608061002181C0A" +
    "060801100118070A060802100218070A0608011002180C12040800100012" +
    "04080210001204080210001A03474D544D00000A240A04080550000A0C08" +
    "0512060802100A181E50000A0E080522080A016112016518125000DF0000" +
    "080310A3011A0A0803103F181A204A28052216080C120201021A0269641A" +
    "046E616D6520002800300022080804200028003000220808072000280030" +
    "0030053A04080550003A0C080512060802100A181E50003A0E080522080A" +
    "01611201651812500040904E48016205322E302E30087210051880800422" +
    "02000C2829300682F403034F524317"

  private val orcLz4Hex: String =
    "4F52431100000A061204080550002B00000A130A03000000120C08051206" +
    "08001008181450003300000A170A050000000000120E080522080A016112" +
    "0165180E5000090000C0040002090000420466400F000061626263646465" +
    "8F00000A0608061000180B0A060806100118180A0608061002181C0A0608" +
    "01100118070A060802100218070A0608011002180A120408001000120408" +
    "0210001204080210001A03474D544D00000A240A04080550000A0C080512" +
    "0608001008181450000A0E080522080A0161120165180E5000DF00000803" +
    "10A1011A0A0803103F1818204A28052216080C120201021A0269641A046E" +
    "616D65200028003000220808042000280030002208080720002800300030" +
    "053A04080550003A0C0805120608001008181450003A0E080522080A0161" +
    "120165180E500040904E48016205322E302E300872100418808004220200" +
    "0C2829300682F403034F524317"

  /** q277/q285 fixture piece: hex of a data-descriptor zip (a.txt +
    * dir/b.bin, both `k` bytes of 'D', stored, zeroed local sizes,
    * PK\x07\x08 descriptors, central directory + EOCD with the exact
    * sizes — the streaming-writer shape). */
  private def ddZipHex(k: Column): Column = {
    def leHex(c: Column, nBytes: Int) = concat((0 until nBytes).map(i =>
      lpad(hex(shiftright(c, 8 * i).bitwiseAND(255L)), 2, "0")): _*)
    val dataHex = call_function("repeat", lit("44"), k.cast("int"))
    def ddLocal(nameHex: String, nlenHex: String) = concat(
      lit("504B03041400" + "0800" + "0000" + "00000000" +
        "000000000000000000000000" + nlenHex + "0000" + nameHex),
      dataHex,
      lit("504B0708" + "00000000"), leHex(k, 4), leHex(k, 4))
    def cdEntry(nameHex: String, nlenHex: String, lho: Column) = concat(
      lit("504B0102" + "14001400" + "0800" + "0000" + "00000000" +
        "00000000"), leHex(k, 4), leHex(k, 4),
      lit(nlenHex + "000000000000000000000000"), leHex(lho, 4),
      lit(nameHex))
    val aHex = "612E747874" // a.txt
    val bHex = "6469722F622E62696E" // dir/b.bin
    concat(ddLocal(aHex, "0500"), ddLocal(bHex, "0900"),
      cdEntry(aHex, "0500", lit(0L)), cdEntry(bHex, "0900", lit(51L) + k),
      lit("504B0506" + "00000000" + "02000200" + "6A000000"),
      leHex(lit(106L) + k * 2L, 4), lit("0000"))
  }

  /** q282/q283 fixture: a 3-page MediaWiki export per doc — an
    * article (entity-escaped wikitext with emphasis, a piped link, a
    * ref and a template), a redirect, and a Talk-namespace page. */
  private def wikiDumpXml(docId: Column): Column = {
    val id = docId.cast("string")
    concat(
      lit("<mediawiki><page><title>Article "), id,
      lit("</title><ns>0</ns><id>"), id,
      lit("</id><revision><id>900</id><text xml:space=\"preserve\">" +
        "'''Article "), id, lit("''' is about [[Topic "), id,
      lit("|topic]].&lt;ref&gt;c&lt;/ref&gt; {{stub}}</text></revision>" +
        "</page><page><title>Old "), id,
      lit("</title><ns>0</ns><id>"), (docId + 1000000L).cast("string"),
      lit("</id><redirect title=\"Article "), id,
      lit("\"/><revision><id>901</id><text>#REDIRECT [[Article "), id,
      lit("]]</text></revision></page><page><title>Talk:X</title>" +
        "<ns>1</ns><id>7</id><revision><id>902</id>" +
        "<text>talk text here</text></revision></page></mediawiki>"))
  }

  /** q264/q265 fixture: a ustar tarball per doc — `src/` dir,
    * `src/main.py` (content carries doc_id) and `README.md` (text
    * slice), all headers CHECKSUMMED the ustar way (fixed-field byte
    * sum precomputed in Scala + short in-row char-sum folds over the
    * only dynamic field, the size octal). Every 8th doc adds 1 to a
    * checksum — the kernel must drop the whole archive. */
  private def tarFixture(s: SparkSession, dir: String,
                         gz: Boolean = false): DataFrame = {
    val fixedSum = ("0000644\u0000" + "0000000\u0000" + "0000000\u0000" +
      "00000000000 " + "        " + "ustar\u000000").map(_.toInt).sum.toLong
    def pad(c: Column, n: Int) = rpad(c, n, "\u0000")
    def octal11(size: Column) =
      concat(lpad(conv(size.cast("string"), 10, 8), 11, "0"), lit(" "))
    def charSum(c: Column): Column =
      aggregate(sequence(lit(1), length(c)), lit(0L),
        (a, i) => a + ascii(c.substr(i, lit(1))))
    def hdr(name: String, size: Column, tf: Char,
            chkAdd: Column): Column = {
      val so = octal11(size)
      val chkVal = lit(fixedSum + name.map(_.toInt).sum + tf.toInt) +
        charSum(so) + chkAdd
      val chk = concat(lpad(conv(chkVal.cast("string"), 10, 8), 6, "0"),
        lit("\u0000 "))
      concat(pad(lit(name), 100),
        lit("0000644\u0000"), lit("0000000\u0000"), lit("0000000\u0000"),
        so, lit("00000000000 "), chk, lit(tf.toString),
        pad(lit(""), 100), lit("ustar\u000000"), pad(lit(""), 247))
    }
    def padTo512(c: Column): Column = {
      val tot = (floor((length(c) + 511) / 512) * 512).cast("int")
      call_function("rpad", c, tot, lit("\u0000"))
    }
    val f1 = concat(lit("print('doc "), col("doc_id").cast("string"),
      lit("')\n"))
    val f2 = substring(col("text"), 1, 30)
    val corrupt = when(pmod(col("doc_id"), lit(8L)) === 0, lit(1L))
      .otherwise(lit(0L))
    val tar = concat(
      hdr("src/", lit(0L), '5', lit(0L)),
      hdr("src/main.py", length(f1).cast("long"), '0', corrupt),
      padTo512(f1),
      hdr("README.md", length(f2).cast("long"), '0', lit(0L)),
      padTo512(f2),
      lit("\u0000" * 1024)).cast("binary")
    // gz: wrap the whole tarball in one stored-block RFC 1952 member
    // (the q255 recipe) — the .tar.gz release shape
    def leHex(c: Column, nBytes: Int) = concat((0 until nBytes).map(i =>
      lpad(hex(shiftright(c, 8 * i).bitwiseAND(255L)), 2, "0")): _*)
    val tlen = length(tar).cast("long")
    val payload =
      if (!gz) tar
      else concat(unhex(lit("1F8B08000000000000FF")),
        unhex(concat(lit("01"), leHex(tlen, 2),
          leHex(lit(65535L) - tlen, 2))),
        tar, unhex(concat(leHex(crc32(tar), 4), leHex(tlen, 4))))
    t(s, dir, "documents")
      .select(col("doc_id"), payload.as("payload")).localCheckpoint()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    coreQueries ++ dmlQueries ++ textQueries ++ dedupQueries ++
      similarityQueries ++ eventQueries ++ miscQueries

  private def coreQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // S1/P1: full scan with explicit projection (exportTable,
    // CopyUtils.java:682-710) — pruned read, no shuffle.
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dbl(sum(dec(col("l_quantity")))).as("sum_qty"),
          dbl(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
          dbl(sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))).as("sum_disc_price"),
          (dbl(sum(dec(col("l_quantity")))) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // S2/F1: keyed IN-list scan (exportTableBatch, CopyUtils.java:621-670)
    "q02_inlist_scan" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_orderkey").isin(1L, 7L, 32L, 66L, 97L, 128L, 193L, 256L))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // J1/J3: the copy-tree walk — chained left-semi joins from root
    // customer ids through orders into lineitem (walkLinked,
    // CopyUtils.java:533-574).
    "q03_copy_tree" -> ((s, dir) => {
      val sels = TreeWalk.selectAlongPath(
        s, name => t(s, dir, name),
        paths = Seq("customer->orders.o_custkey", "orders->lineitem.l_orderkey"),
        pks = SchemaCatalog.walkPks,
        rootTable = "customer",
        rootIds = (1L to 10L),
        cache = false) // single consumer — caching would only leak
      val lineitemSel = sels.last
      TreeWalk.selectRows(name => t(s, dir, name), lineitemSel)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // J3 extended past the reference's single-column-PK hard error
    // (CopyUtils.java:410-412): the same walk with lineitem keyed by
    // its natural composite PK (l_orderkey, l_linenumber) — the
    // selection carries the full two-column key
    "q55_composite_walk" -> ((s, dir) => {
      val sels = TreeWalk.selectAlongPathComposite(
        s, name => t(s, dir, name),
        paths = Seq("customer->orders.o_custkey", "orders->lineitem.l_orderkey"),
        pks = SchemaCatalog.compositeWalkPks,
        rootTable = "customer",
        rootIds = (1L to 10L),
        cache = false) // single consumer — caching would only leak
      sels.last.keys
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // J4/K5 query form: delete-tree = anti join (deleteSelections,
    // CopyUtils.java:23-31; DeleteByPk.java:15-43)
    "q04_delete_tree" -> ((s, dir) => {
      val loader = (name: String) => t(s, dir, name)
      val sels = TreeWalk.selectAlongPath(
        s, loader,
        paths = Seq("customer->orders.o_custkey"),
        pks = SchemaCatalog.walkPks,
        rootTable = "customer",
        rootIds = (1L to 10L),
        cache = false) // single consumer — caching would only leak
      TreeWalk.antiRows(loader, sels.last)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy("o_orderkey")
    }),

    // J1: semi join against a filtered dimension (findLinkedRows,
    // CopyUtils.java:480-531)
    "q05_semi_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer").filter(col("c_acctbal") > 9000.0)
      o.join(c, o("o_custkey") === c("c_custkey"), "left_semi")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // O: top-k with deterministic tiebreak (TakeOrderedAndProject)
    "q06_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    // window functions: running totals per customer
    "q07_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("run_total",
          dbl(sum(dec(col("o_totalprice"))).over(w.rowsBetween(Window.unboundedPreceding, 0))))
        .select("o_custkey", "o_orderkey", "rn", "run_total")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // rollup over the region→nation→customer→orders join
    "q08_rollup" -> ((s, dir) => {
      val r = t(s, dir, "region"); val n = t(s, dir, "nation")
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(dbl(sum(dec(col("o_totalprice")))).as("total_sales"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    }),

    // multi-way join with broadcast dims (TPC-H Q5 shape)
    "q10_join_revenue" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem"); val sup = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey") && c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(dbl(sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    }),

    // GROUPING SETS through the SQL surface
    "q09_grouping_sets" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(
        """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
          |FROM orders
          |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
          |ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin)
    }),

    // set ops: EXCEPT (F4 family) and UNION (§2.7)
    "q11_except" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(col("o_orderstatus") === "O").select("o_custkey").distinct()
        .except(o.filter(col("o_orderstatus") === "F").select("o_custkey").distinct())
        .orderBy("o_custkey")
    }),
    "q12_union" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      c.filter(col("c_nationkey").isin(1, 2)).select("c_custkey")
        .union(c.filter(col("c_acctbal") > 9500.0).select("c_custkey"))
        .distinct()
        .orderBy("c_custkey")
    }),

    // the skew toolkit exercised end to end: salted join ≡ plain join
    // (the oracle IS the unsalted SQL join), but each hot key spreads
    // over saltFactor reducers
    "q56_salted_join" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      val o = t(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      graft.ops.Scale.saltedJoin(l, o, "l_orderkey", saltFactor = 8)
        .groupBy(col("o_orderpriority"))
        .agg(dbl(sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority")
    }),
    // pivot (conditional aggregation form in the oracle)
    "q15_pivot" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy("o_orderpriority")
    }),
  )

  /** K4/K5 as queries (upsert merge, delete-by-pk) — Writers semantics
    * on fixture-derived base/delta frames. */
  private def dmlQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q13_upsert_merge" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val base = c.filter(col("c_custkey") <= 100)
        .select(col("c_custkey").as("pk"), col("c_name").as("name"), col("c_acctbal").as("bal"))
      val delta = c.filter(col("c_custkey").between(51, 150))
        .select(col("c_custkey").as("pk"),
          concat(lit("u_"), col("c_name")).as("name"),
          (col("c_acctbal") + 1000.0).as("bal"))
      Writers.upsert(base, delta, "pk").orderBy("pk")
    }),
    "q14_delete_pk" -> ((s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer")
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
      Writers.deleteByPk(c, (1L to 25L).toDF("k"), "c_custkey")
        .orderBy("c_custkey")
    }),
  )

  private def textQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_token_stats" -> ((s, dir) =>
      TextAnalysis.tokenStats(t(s, dir, "documents")).orderBy("doc_id")),
    "q21_lang_guess" -> ((s, dir) =>
      TextAnalysis.languageGuess(t(s, dir, "documents")).orderBy("doc_id")),
    "q22_quality_score" -> ((s, dir) =>
      TextAnalysis.qualityScore(t(s, dir, "documents")).orderBy("doc_id")),
    "q23_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprint(t(s, dir, "documents")).orderBy("doc_id")),
    "q40_scrub" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.scrub(col("text")).as("clean"))
        .orderBy("doc_id")),
    "q41_train_test_split" -> ((s, dir) =>
      TextAnalysis.trainTestSplit(t(s, dir, "documents"), "doc_id")
        .groupBy("split").agg(count(lit(1)).as("n_docs"))
        .orderBy("split")),
    "q42_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionScore(t(s, dir, "documents")).orderBy("doc_id")),
    "q43_length_histogram" -> ((s, dir) =>
      TextAnalysis.lengthHistogram(t(s, dir, "documents")).orderBy("bucket")),
    // overlapping token-window chunks (size 50, stride 40) — corpus
    // prep for embedding/training over long documents
    "q54_chunking" -> ((s, dir) =>
      TextAnalysis.chunk(t(s, dir, "documents"), size = 50, stride = 40)
        .orderBy("doc_id", "chunk_id")),
    // PII audit + redaction: the corpus is deterministically enriched
    // with synthetic emails/IPs/phone numbers derived from doc_id (the
    // fixture text carries no PII of its own), then counted and
    // redacted; the redacted text is pinned by hash
    "q81_pii_redact" -> ((s, dir) => {
      val enriched = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          lit(" reach user"), col("doc_id"), lit("@mail.example.com from host 10."),
          pmod(col("doc_id"), lit(200L)), lit("."), pmod(col("doc_id"), lit(250L)),
          lit(".7 or call +1-555-"),
          lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0")).as("text"))
      TextAnalysis.piiStats(enriched).orderBy("doc_id")
    }),
    // content-defined (Rabin-style) chunking: boundaries addressed by
    // shingle hash, so edits move only local boundaries — the
    // chunk-level-dedup companion of the fixed grid above
    "q83_content_chunks" -> ((s, dir) =>
      TextAnalysis.contentChunks(t(s, dir, "documents"))
        .orderBy("doc_id", "chunk_idx")),
    // corpus-level boilerplate: 3-gram shingles repeated across ≥ 5
    // distinct documents (template text detection)
    "q65_boilerplate" -> ((s, dir) =>
      TextAnalysis.boilerplateNgrams(t(s, dir, "documents"), shingleN = 3, minDocs = 5)
        .orderBy(col("n_docs").desc, col("ngram").asc)
        .limit(30)),
    // source-overlap matrix: pairwise shingle Jaccard between sources
    // — the mirror-site / re-crawl redundancy map
    "q155_source_overlap" -> ((s, dir) =>
      Dedup.sourceOverlap(t(s, dir, "documents"))
        .orderBy("source_a", "source_b")),
    // per-source dedup burden: how many of each source's docs the
    // q60 dedup policy drops — the mirror/aggregator attribution
    "q156_dedup_burden" -> ((s, dir) => {
      val docs = t(s, dir, "documents").repartition(s.sparkContext.defaultParallelism)
      val pairs = Dedup.candidatePairs(
        Dedup.lshBands(Dedup.minhash(docs, k = 6), bands = 3, rowsPerBand = 2))
        .localCheckpoint()
      Dedup.dedupBurden(docs, pairs).orderBy("source")
    }),
    // precision/recall sweep of the q22 quality score against the
    // src1* label — the operating-point picker behind q135's AUC
    "q157_threshold_sweep" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val scored = TextAnalysis.qualityScore(docs)
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      TextAnalysis.thresholdSweep(scored, "quality",
        col("source").startsWith("src1"))
        .orderBy("bucket")
    }),
    // train/test decontamination: test docs sharing a 5-gram with any
    // train doc (the benchmark-leakage audit)
    "q64_decontamination" -> ((s, dir) =>
      TextAnalysis.decontaminate(t(s, dir, "documents"), shingleN = 5)
        .orderBy("doc_id")),
    // the same audit behind a Bloom runtime filter: test shingles are
    // pre-filtered map-side before the exact semi-join; result is
    // provably identical (no false negatives) — same oracle family
    "q97_decontaminate_bloom" -> ((s, dir) =>
      TextAnalysis.decontaminateBloom(t(s, dir, "documents"), shingleN = 4)
        .orderBy("doc_id")),
    // BPE-ish token counting: word runs + individual punctuation marks
    "q51_regex_tokens" -> ((s, dir) => {
      val toks = TextAnalysis.regexTokens(col("text"))
      t(s, dir, "documents").select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"))
        .orderBy("doc_id")
    }),
    // smoothed-idf TF-IDF, top 5 terms per document (ranked on the
    // 6-decimal-rounded score so rank order is engine-portable)
    "q68_tfidf" -> ((s, dir) =>
      Corpus.tfidf(t(s, dir, "documents"), topN = 5)
        .orderBy("doc_id", "rnk")),
    // token-budget sequence packing (concat-then-chunk, sharded so no
    // single source serializes the running-sum window)
    "q69_sequence_pack" -> ((s, dir) =>
      Corpus.sequencePack(t(s, dir, "documents"), budget = 512, nShards = 8)
        .orderBy("source", "shard", "chunk_id")),
    // corpus-trained bigram LM score per document (perplexity proxy
    // for quality filtering); decimal-summed rounded log-probs
    "q70_bigram_lm" -> ((s, dir) =>
      Corpus.bigramLogProb(t(s, dir, "documents"))
        .orderBy("doc_id")),
    // interpolated trigram LM: smooth backoff across orders, the q70
    // decimal-exact determinism recipe one order up
    "q101_trigram_lm" -> ((s, dir) =>
      Corpus.trigramLogProb(t(s, dir, "documents"))
        .orderBy("doc_id")),
    // Kneser-Ney bigram LM: fixed-discount mass routed to CONTINUATION
    // probabilities — the production perplexity-filter smoothing
    "q118_kneser_ney" -> ((s, dir) =>
      Corpus.kneserNeyLogProb(t(s, dir, "documents"))
        .orderBy("doc_id")),
    // conjunctive search via inverted-index posting intersection —
    // work scales with matched postings, not corpus text
    "q79_phrase_search" -> ((s, dir) =>
      Corpus.searchAll(
        Corpus.invertedIndex(t(s, dir, "documents")),
        phrase = Seq("hash", "join", "filter"))
        .orderBy("doc_id")),
    // BM25 ranking over the same term query as q79 (k1=1.2, b=0.75)
    "q80_bm25" -> ((s, dir) =>
      Corpus.bm25(t(s, dir, "documents"),
        terms = Seq("hash", "join", "filter"), topN = 10)),
    // batch retrieval: top-10 per query for a query SET in one corpus
    // pass — same scoring recipe as q80, TopK-bounded ranking
    "q158_bm25_batch" -> ((s, dir) =>
      Corpus.bm25Batch(t(s, dir, "documents"), queries = Seq(
        0L -> Seq("hash", "join", "filter"),
        1L -> Seq("stream", "window"),
        2L -> Seq("sort", "merge", "dup"),
        3L -> Seq("vector", "query", "fast")), topN = 10)
        .orderBy("query_id", "rank")),
    // vocabulary-indexed encoding: frequency-ranked ids, OOV → 0
    "q78_encode_tokens" -> ((s, dir) =>
      Corpus.encodeTokens(t(s, dir, "documents"), vocabSize = 100)
        .filter(col("doc_id") < 50)
        .orderBy("doc_id", "pos")),
    // curriculum mixture: src0 oversampled past its size (capped at 1),
    // src1 at a 0.2 share, the long tail at the default weight
    "q74_mixture_sample" -> ((s, dir) =>
      Corpus.mixtureSample(t(s, dir, "documents"),
        weights = Map("src0" -> 0.4, "src1" -> 0.2),
        targetTokens = 5000L, defaultWeight = 0.02)
        .orderBy("doc_id")),
    // per-source cap through the bounded TopK aggregator — the shuffle
    // carries the cap, not the corpus (a window row_number moves it all)
    "q89_cap_per_source" -> ((s, dir) =>
      Corpus.capPerSource(t(s, dir, "documents"), maxDocs = 15, ordCol = col("n_chars"))
        .orderBy("source", "rnk")),
    // JSONL interchange round-trip: write the corpus as line-delimited
    // JSON, read it back with the explicit-schema PERMISSIVE reader —
    // the hash check proves the format preserves every value
    "q90_jsonl_roundtrip" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
      graft.sources.CorpusIO.writeJsonl(t(s, dir, "documents"), tmp)
      graft.sources.CorpusIO.readJsonlClean(s, tmp)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),
    // Gopher-style hard accept/reject rules with per-rule flags
    "q91_gopher_rules" -> ((s, dir) =>
      TextAnalysis.gopherRules(t(s, dir, "documents")).orderBy("doc_id")),
    // fastText-style linear classifier inference over a hashed token
    // bag: broadcast-literal weights on a 1/64 binary grid (exact
    // order-free double sums), md5-nibble bucket hash — model
    // inference at scan speed, bit-reproducible in the oracle
    "q103_linear_score" -> ((s, dir) =>
      TextAnalysis.linearScore(t(s, dir, "documents"),
          weights = linearScoreWeights, bias = 0.5)
        .orderBy("doc_id")),
    // deterministic EXACT-size per-stratum sample (fixed eval sets):
    // md5-ranked through the bounded TopK aggregator, no window sort
    "q93_exact_sample" -> ((s, dir) =>
      TextAnalysis.exactSample(t(s, dir, "documents"), k = 8)
        .orderBy("source", "rnk")),
    // weight-proportional deterministic sampling (A-ES priorities from
    // md5 bits; bounded TopK, no RNG, no window sort)
    "q108_weighted_sample" -> ((s, dir) =>
      TextAnalysis.weightedSample(t(s, dir, "documents"), k = 8,
        col("n_chars"))
        .orderBy("source", "rnk")),
    // heavy hitters with bounded state: MG sketch for candidates, exact
    // re-count for the emitted set — same rows as the full group-by
    "q95_heavy_hitters" -> ((s, dir) =>
      TextAnalysis.heavyHitterTokens(t(s, dir, "documents"), k = 40)
        .orderBy("token")),
    // count-min sketch contract (q38's HLL pattern): the estimate is
    // engine-specific (xxhash64 family), so the oracle-checkable
    // columns are the exact counts plus the CM guarantees — est never
    // below exact, and within an 8·N/width band (8× the expected
    // single-row collision mass; min over 4 rows sits far inside it)
    "q107_count_min" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val sketch = TextAnalysis.cmsSketch(docs, depth = 4, width = 8192)
      val toks = docs.select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      val total = toks.agg(count(lit(1)).as("__n"))
      val top = toks.groupBy("token").agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("token")).limit(30)
        .localCheckpoint() // 30 rows; feeds both the probe and the join
      top.join(TextAnalysis.cmsEstimate(top, sketch, depth = 4, width = 8192),
          Seq("token"))
        .crossJoin(broadcast(total))
        .select(col("token"), col("exact_cnt"),
          (col("est") >= col("exact_cnt")).as("ge_exact"),
          (col("est") <= col("exact_cnt")
            + lit(8.0) * col("__n") / lit(8192)).as("within_band"))
        .orderBy(col("exact_cnt").desc, col("token"))
    }),
    // EXACT per-source token budget: greedy md5-priority prefix whose
    // running total stays within budget (mixtureSample is rate-based)
    "q98_token_budget" -> ((s, dir) =>
      Corpus.tokenBudgetSample(t(s, dir, "documents"), budgetTokens = 600)
        .orderBy("source", "doc_id")),
    // sentence segmentation on punctuation-enriched text (the fixture
    // corpus has none — same deterministic-enrichment trick as q81)
    "q99_sentences" -> ((s, dir) =>
      TextAnalysis.sentences(
        t(s, dir, "documents").withColumn("text",
          concat(col("text"), lit(". Extra tail one! Question two? End."))))
        .orderBy("doc_id", "sent_id")),
    // boilerplate-sentence removal: the shared enrichment tail occurs
    // in every doc and must vanish; each doc's own text survives
    "q100_remove_boilerplate" -> ((s, dir) =>
      TextAnalysis.removeBoilerplateSentences(
        t(s, dir, "documents").withColumn("text",
          concat(col("text"), lit(". Extra tail one! Question two? End."))),
        minDocs = 3)
        .orderBy("doc_id")),
    // C4-style WITHIN-doc duplicate-sentence removal: the enrichment
    // tail plants an in-document repeat ("Dup one!" twice) that the
    // cleaner must collapse to its first occurrence, zero shuffles
    "q104_dedup_sentences" -> ((s, dir) =>
      TextAnalysis.dedupSentencesWithinDoc(
        t(s, dir, "documents").withColumn("text",
          concat(col("text"), lit(". Dup one! Dup one! Unique tail."))))
        .orderBy("doc_id")),
    // context-length capping before packing — narrow, zero shuffles
    "q110_truncate_tokens" -> ((s, dir) =>
      TextAnalysis.truncateTokens(t(s, dir, "documents"), maxTokens = 50)
        .orderBy("doc_id")),
    // RAG-prep chunking: overlapping sentence windows (same enriched
    // punctuation trick as q99 — the fixture corpus has none)
    "q111_sentence_windows" -> ((s, dir) =>
      TextAnalysis.sentenceWindows(
        t(s, dir, "documents").withColumn("text",
          concat(col("text"), lit(". Extra tail one! Question two? End."))),
        windowSize = 2, stride = 1)
        .orderBy("doc_id", "chunk_id")),
    // exact substring-level cross-document dedup (Lee et al. 2022) at
    // CDC-chunk granularity: repeated ≥8-token chunks removed from
    // every occurrence but the canonical first; frequency table keyed
    // by chunk hash, never text
    "q112_remove_repeated_spans" -> ((s, dir) =>
      Dedup.removeRepeatedSpans(t(s, dir, "documents"),
        minTokens = 8, minDocs = 2)
        .orderBy("doc_id")),
    // BYTE-LEVEL BPE training (the GPT-2 production shape): merges at
    // UTF-8 byte grain through the byte<->unicode table, on an
    // accent-injected corpus so multi-byte sequences genuinely merge
    "q333_byte_bpe_train" -> ((s, dir) =>
      Corpus.bpeTrain(
        t(s, dir, "documents").withColumn("text",
          translate(col("text"), "ae", "\u00e4\u00e9")),
        numMerges = 8, byteLevel = true)
        .orderBy("rank")),
    // BPE tokenizer training: 8 highest-frequency pair merges over the
    // per-character vocab, deterministic lexicographic tie-break —
    // loop state is the vocab table, never the corpus
    "q113_bpe_train" -> ((s, dir) =>
      Corpus.bpeTrain(t(s, dir, "documents"), numMerges = 8)
        .orderBy("rank")),
    // the encode half of the q113 contract: replay the corpus-trained
    // merges onto a restricted token stream (vocab-sized merge replay,
    // token stream joined once)
    "q114_bpe_encode" -> ((s, dir) => {
      val merges = Corpus.bpeTrain(t(s, dir, "documents"), numMerges = 8)
        .orderBy("rank").select("left_sym", "right_sym")
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      Corpus.bpeEncode(t(s, dir, "documents").filter(col("doc_id") < 50), merges)
        .orderBy("doc_id", "pos", "piece_idx")
    }),
    // DSIR importance resampling: raw docs re-weighted toward the
    // src1* target distribution via hashed-bucket log-ratios, sampled
    // without replacement by the deterministic E-S machinery
    "q117_dsir_sample" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Corpus.dsirSample(
        raw = docs.filter(!col("source").startsWith("src1")),
        target = docs.filter(col("source").startsWith("src1")),
        k = 25, buckets = 256)
        .orderBy("rnk")
    }),
    // Moore-Lewis cross-entropy difference selection toward the SAME
    // src1* target as q117 — LM likelihood-ratio ranking vs DSIR's
    // hashed-distribution matching, the two published data-selection
    // families side by side
    "q119_moore_lewis" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Corpus.mooreLewisSelect(
        raw = docs.filter(!col("source").startsWith("src1")),
        inDomain = docs.filter(col("source").startsWith("src1")),
        k = 30)
        .orderBy("rnk")
    }),
    // snapshot delta detection: diff a simulated next crawl (drops
    // every 7th doc, edits every 5th, adds a +1000000-id copy of every
    // 13th) against the current corpus — the churn set an incremental
    // pipeline processes instead of the full snapshot
    "q121_snapshot_diff" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val next = docs.filter(col("doc_id") % 7 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")))
        .unionByName(docs.filter(col("doc_id") % 13 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L))
      graft.ops.SnapshotDiff.diff(docs, next, "doc_id",
        Seq("text", "lang", "source", "n_chars"))
        .orderBy("doc_id")
    }),
    // distinct-n corpus diversity per source: distinct/total n-gram
    // ratios at n=1..3 — the collapsed-source detector
    "q122_ngram_diversity" -> ((s, dir) =>
      Corpus.ngramDiversity(t(s, dir, "documents"))
        .orderBy("source", "n")),
    // quality-classifier TRAINING (the train half of q103's inference):
    // hashed-bag logistic regression, 3 full-batch GD steps, decimal-
    // summed products and 9-dp sigmoid rounding — weights reproduce
    // bit-for-bit in any engine
    "q115_logreg_train" -> ((s, dir) =>
      TextAnalysis.logregTrain(t(s, dir, "documents"),
        label = col("source").startsWith("src1"),
        buckets = 64, steps = 3, lr = 0.5)
        .orderBy("bucket")),
    // distributed exact discrete quantile — two-pass histogram, no
    // whole-stratum sort (the q47 exact-percentile scale gap closed)
    "q105_exact_quantile" -> ((s, dir) =>
      graft.ops.Scale.kthSmallestByKey(
        t(s, dir, "orders"), "o_totalprice", "o_orderpriority", 0.9)
        .orderBy("o_orderpriority")),
    // CCNet-style perplexity filtering: bigram-LM score → exact
    // per-source tail quantile → keep strictly above the cutoff
    "q106_perplexity_filter" -> ((s, dir) =>
      Corpus.perplexityTailFilter(t(s, dir, "documents"), 0.25)
        .orderBy("source", "doc_id")),
    // CCNet's three-way form of q106: label every scored doc head/
    // middle/tail at the exact per-source 1/3 and 2/3 logprob cuts —
    // the buckets downstream mixture weights key on
    "q191_perplexity_buckets" -> ((s, dir) =>
      Corpus.perplexityBuckets(t(s, dir, "documents"))
        .orderBy("source", "doc_id")),
    // T5 span corruption: deterministic md5-placed 2-token spans in
    // fixed 10-token blocks -> sentinel-numbered (input, target) pairs
    "q194_span_corrupt" -> ((s, dir) =>
      Corpus.spanCorrupt(t(s, dir, "documents")).orderBy("doc_id")),
    // data-constrained repetition schedule: mixture weights demanding
    // more than one epoch repeat the source; fractional epochs admit
    // docs by the deterministic 8-bit md5 threshold
    "q144_epoch_schedule" -> ((s, dir) =>
      Corpus.epochSchedule(t(s, dir, "documents"),
        weights = Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2),
        budgetTokens = 5000L)
        .orderBy("doc_id", "epoch")),
    // trained char-trigram language ID: per-language profiles from
    // the corpus's own labels, Laplace-smoothed decimal-exact argmax
    // score column excluded: ln() is not bit-specified across engines
    // (see the charNgramLangId determinism note) — the contract is
    // the prediction
    "q150_langid_trained" -> ((s, dir) =>
      TextAnalysis.charNgramLangId(t(s, dir, "documents"))
        .select("doc_id", "lang_true", "lang_pred", "correct")
        .orderBy("doc_id")),
    // unigram-LM tokenizer family (SentencePiece): seed vocabulary
    // with 9-dp DECIMAL log-probs over corpus substrings
    "q146_unigram_vocab" -> ((s, dir) =>
      Corpus.unigramSeedVocab(t(s, dir, "documents"))
        .orderBy("piece")),
    // Viterbi segmentation under the seeded unigram LM — exact
    // DECIMAL path sums, ties to the longest last piece
    "q147_unigram_segment" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val vocab = Corpus.unigramSeedVocab(docs).localCheckpoint()
      Corpus.unigramSegment(docs.filter(col("doc_id") < 50), vocab)
        .orderBy("doc_id", "pos", "piece_idx")
    }),
    // one EM re-estimation: Viterbi piece counts over the corpus,
    // re-normalized — the M-step of Kudo's training loop
    "q148_unigram_reestimate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val vocab = Corpus.unigramSeedVocab(docs).localCheckpoint()
      Corpus.unigramReestimate(docs, vocab).orderBy("piece")
    }),
    // tokenizer fertility by source under the learned q113 merges:
    // pieces/word — the tokenizer-fairness audit
    "q141_tokenizer_fertility" -> ((s, dir) => {
      val merges = Corpus.bpeTrain(t(s, dir, "documents"), numMerges = 8)
        .orderBy("rank").select("left_sym", "right_sym")
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      Corpus.tokenizerFertility(t(s, dir, "documents"), merges)
        .orderBy("source")
    }),
    // deterministic global shuffle into training shards: md5 shard +
    // md5-priority rank — reproducible data order, no RNG
    "q142_shuffle_shards" -> ((s, dir) =>
      Corpus.shuffleShards(t(s, dir, "documents"), nShards = 8)
        .orderBy("doc_id")),
    // skip-gram co-occurrence counts: word2vec/GloVe training-data
    // generation — narrow per-row context expansion, one group-by
    "q136_skipgram" -> ((s, dir) =>
      Corpus.skipgramPairs(t(s, dir, "documents"), window = 2)
        .orderBy("center", "context")),
    // length-bucketed batching report: padding waste under bucketed vs
    // global padding — the loader-bucketing audit, all-integer outputs
    "q137_padding_stats" -> ((s, dir) =>
      Corpus.paddingStats(t(s, dir, "documents"), maxLen = 128, bucketWidth = 16)
        .orderBy("bucket")),
    // per-doc n-gram novelty: share of distinct shingles occurring in
    // no other document — the redundancy/memorization-risk audit
    "q138_ngram_novelty" -> ((s, dir) =>
      TextAnalysis.ngramNovelty(t(s, dir, "documents"))
        .orderBy("doc_id")),
  )

  private def dedupQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q24_exact_dedup" -> ((s, dir) =>
      Dedup.exactByContent(t(s, dir, "documents"), "doc_id", Seq("text"))
        .orderBy("content_hash")),
    "q25_minhash_sig" -> ((s, dir) =>
      Dedup.minhash(t(s, dir, "documents"), k = 6).orderBy("doc_id")),
    "q26_simhash" -> ((s, dir) =>
      Dedup.simhash(t(s, dir, "documents")).orderBy("doc_id")),
    "q27_jaccard_topk" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") % 5 === 0)
      Dedup.jaccardPairs(docs)
        .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
        .limit(20)
    }),
    // the full LSH dedup pipeline — minhash → banding → per-bucket
    // candidate pairs → exact Jaccard only for candidates. This is the
    // 100 TB path (pair generation is local to each band bucket); the
    // all-pairs q27 is the labeled exact baseline.
    // incremental ingest screening: a new batch against the existing
    // corpus's band index — cross pairs only, batch bands broadcast
    "q96_incremental_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").repartition(s.sparkContext.defaultParallelism)
      val existing = docs.filter(col("doc_id") % 10 =!= 0)
      val batch = docs.filter(col("doc_id") % 10 === 0)
      val eb = Dedup.lshBands(Dedup.minhash(existing, k = 6), bands = 3, rowsPerBand = 2)
      val pairs = Dedup.incrementalCandidatePairs(eb, batch, bands = 3, rowsPerBand = 2)
        .localCheckpoint()
      Dedup.jaccardForPairs(docs, pairs).orderBy("doc_a", "doc_b")
    }),
    "q48_lsh_candidates" -> ((s, dir) => {
      // the fixture corpus is one parquet split; the signature pass is
      // CPU-bound, so spread it across all cores first (at real scale
      // the input's own splits provide this and the repartition goes)
      val docs = t(s, dir, "documents").repartition(s.sparkContext.defaultParallelism)
      val sigs = Dedup.minhash(docs, k = 6)
      // the candidate set is tiny relative to the corpus — materialize
      // it once; its three consumers (candidate-id pruning, the shared
      // count, the final join) must not re-run the signature pass
      val pairs = Dedup.candidatePairs(Dedup.lshBands(sigs, bands = 3, rowsPerBand = 2))
        .localCheckpoint()
      Dedup.jaccardForPairs(docs, pairs)
        .orderBy("doc_a", "doc_b")
    }),
    // asymmetric containment over the same candidate pipeline — the
    // quote/boilerplate-wrap detector symmetric Jaccard misses
    "q82_containment" -> ((s, dir) => {
      val docs = t(s, dir, "documents").repartition(s.sparkContext.defaultParallelism)
      val sigs = Dedup.minhash(docs, k = 6)
      val pairs = Dedup.candidatePairs(Dedup.lshBands(sigs, bands = 3, rowsPerBand = 2))
        .localCheckpoint()
      Dedup.containmentForPairs(docs, pairs)
        .orderBy("doc_a", "doc_b")
    }),
    // the verification-free screening stage: Jaccard ESTIMATED from
    // signature agreement alone — per pair reads 2k signature values,
    // no shingle join
    "q63_jaccard_estimate" -> ((s, dir) => {
      val docs = t(s, dir, "documents").repartition(s.sparkContext.defaultParallelism)
      val sigs = Dedup.minhash(docs, k = 6).localCheckpoint()
      val pairs = Dedup.candidatePairs(Dedup.lshBands(sigs, bands = 3, rowsPerBand = 2))
      Dedup.jaccardEstimate(sigs, pairs, k = 6)
        .orderBy("doc_a", "doc_b")
    }),
    // pairs → duplicate CLUSTERS: iterative min-label propagation,
    // checked against a recursive-CTE transitive closure in the oracle
    "q50_dedup_components" -> ((s, dir) => {
      val docs = t(s, dir, "documents").repartition(s.sparkContext.defaultParallelism)
      val pairs = Dedup.candidatePairs(
        Dedup.lshBands(Dedup.minhash(docs, k = 6), bands = 3, rowsPerBand = 2))
        .localCheckpoint()
      Dedup.connectedComponents(pairs).orderBy("doc_id")
    }),
    // leakage-safe split: hash-split by near-dup CLUSTER label so no
    // near-duplicate pair straddles train/test — per-doc split (q41)
    // made contamination-proof by the q50 component machinery
    "q120_cluster_split" -> ((s, dir) => {
      val docs = t(s, dir, "documents").repartition(s.sparkContext.defaultParallelism)
      val pairs = Dedup.candidatePairs(
        Dedup.lshBands(Dedup.minhash(docs, k = 6), bands = 3, rowsPerBand = 2))
        .localCheckpoint()
      Dedup.clusterSafeSplit(docs, pairs)
        .select("doc_id", "comp", "split").orderBy("doc_id")
    }),
    // dedup-method quality harness: LSH-band and SimHash candidates
    // measured against exact all-pairs Jaccard truth at 0.5 (the
    // audit-slice quadratic harness class, q58's pattern for text)
    "q133_candidate_quality" -> ((s, dir) => {
      val docs = t(s, dir, "documents").repartition(s.sparkContext.defaultParallelism)
      Dedup.candidateQuality(docs, threshold = 0.5).orderBy("method")
    }),
    // dedup report card: cluster-size histogram + docs removed per
    // size class over the q50 component labels
    "q132_cluster_stats" -> ((s, dir) => {
      val docs = t(s, dir, "documents").repartition(s.sparkContext.defaultParallelism)
      val pairs = Dedup.candidatePairs(
        Dedup.lshBands(Dedup.minhash(docs, k = 6), bands = 3, rowsPerBand = 2))
        .localCheckpoint()
      Dedup.clusterSizeStats(pairs).orderBy("cluster_size")
    }),
    // quality-aware dedup: per duplicate cluster keep the BEST-scored
    // member (ties to min id), not the arbitrary minimum id — the
    // RefinedWeb keep-the-cleanest-copy policy
    "q143_dedup_best" -> ((s, dir) => {
      val docs = t(s, dir, "documents").repartition(s.sparkContext.defaultParallelism)
      val pairs = Dedup.candidatePairs(
        Dedup.lshBands(Dedup.minhash(docs, k = 6), bands = 3, rowsPerBand = 2))
        .localCheckpoint()
      val scored = docs.join(TextAnalysis.qualityScore(docs), Seq("doc_id"))
      Dedup.dedupCorpusBest(scored, pairs, "quality")
        .select("doc_id", "quality").orderBy("doc_id")
    }),
    // the pipeline's end product: the corpus with one representative
    // kept per duplicate cluster (anti-join against the non-reps)
    "q60_dedup_corpus" -> ((s, dir) => {
      val docs = t(s, dir, "documents").repartition(s.sparkContext.defaultParallelism)
      val pairs = Dedup.candidatePairs(
        Dedup.lshBands(Dedup.minhash(docs, k = 6), bands = 3, rowsPerBand = 2))
        .localCheckpoint()
      Dedup.dedupCorpus(docs, pairs).select("doc_id").orderBy("doc_id")
    }),
    // exact edit-distance verification over the LSH-bounded candidate
    // set (never all-pairs); thresholded Levenshtein early-exits
    "q75_editdist_neardup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").repartition(s.sparkContext.defaultParallelism)
      val pairs = Dedup.candidatePairs(
        Dedup.lshBands(Dedup.minhash(docs, k = 6), bands = 3, rowsPerBand = 2))
        .localCheckpoint()
      Dedup.editDistancePairs(docs, pairs, maxDist = 200)
        .orderBy("doc_a", "doc_b")
    }),
    // simhash near-dup via nibble blocking — exact for hamming ≤ 3,
    // never all-pairs
    "q52_simhash_neardup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").repartition(s.sparkContext.defaultParallelism)
      Dedup.simhashNearDup(docs, maxHamming = 1)
        .orderBy("doc_a", "doc_b")
    }),
    // production-width 64-bit fingerprints — 16 bits saturates at 65k
    // distinct values; these two are the crawl-scale forms
    "q86_simhash64" -> ((s, dir) =>
      Dedup.simhash64(t(s, dir, "documents")).orderBy("doc_id")),
    "q87_simhash64_neardup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").repartition(s.sparkContext.defaultParallelism)
      Dedup.simhashNearDup64(docs, maxHamming = 3)
        .orderBy("doc_a", "doc_b")
    }),
    // the README pipeline as ONE lazy plan, hash-checked end to end:
    // exact dedup → LSH near-dup removal → Gopher rules → PII redaction.
    // Every stage is a real operator from this library; n_tokens is the
    // pre-redaction document length
    "q92_curation_pipeline" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val keepIds = Dedup.exactByContent(docs, "doc_id", Seq("text"))
        .select(col("keep_id").as("doc_id"))
      // materialize each stage boundary once (a production run persists
      // them to the lake): d1 feeds three consumers (signatures, CC's
      // node set, the final join) and d2 feeds two — without the cut,
      // every consumer re-runs the whole upstream chain
      val d1 = docs.join(keepIds, Seq("doc_id")).localCheckpoint()
      val pairs = Dedup.candidatePairs(
        Dedup.lshBands(Dedup.minhash(d1, k = 6), bands = 3, rowsPerBand = 2))
      val d2 = Dedup.dedupCorpus(d1, pairs).localCheckpoint()
      val good = TextAnalysis.gopherRules(d2).filter(col("keep")).select("doc_id")
      d2.join(good, Seq("doc_id"))
        .select(col("doc_id"), col("source"),
          TextAnalysis.redactPii(col("text")).as("text"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
        .orderBy("doc_id")
    }),
  )

  private def similarityQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_cosine_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.cosineTopK(emb.filter(col("vec_id") < 10), emb, k = 5)
        .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank").as("rnk"))
        .orderBy("query_id", "rnk")
    }),
    // LSH-bucketed ANN — the 100 TB path; deterministic md5 planes make
    // the bucket family inlinable into the DuckDB oracle (annLshOracle)
    "q29_ann_lsh" -> ((s, dir) => {
      Similarity.annTopK(t(s, dir, "embeddings"), queryIds = Seq(0L, 1L, 2L, 3L, 4L),
        k = 3, planes = 4, dim = 64)
        .orderBy("query_id", "rank")
    }),
    // per-label embedding centroids, 2^24-grid quantized: floor onto the
    // grid makes every element an exact integer sum — partition-order
    // independent AND engine-portable (decimal casts of doubles round
    // from different representations across engines; floor cannot tie).
    // Emitted as one (label, pos, m) row per centroid element — scalar
    // columns only, so the driver's comparator can sort/hash them.
    // The unquantized typed-Aggregator form is graft.functions.VectorMean.
    "q46_label_centroids" -> ((s, dir) => {
      val q = 16777216.0 // 2^24: full float mantissa
      t(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos"))
        .agg((sum(floor(col("v").cast("double") * q).cast("long")).cast("double")
          / count(lit(1)) / q).as("m"))
        .select(col("label"), col("pos").cast("long").as("pos"), col("m"))
        .orderBy("label", "pos")
    }),
    // embedding-space data cleaning: cosine of every vector to its OWN
    // label centroid (exact-integer mean), sub-threshold vectors
    // flagged as likely mislabeled — the pre-training noise filter
    "q123_centroid_outliers" -> ((s, dir) =>
      Similarity.centroidOutliers(t(s, dir, "embeddings"), minCosine = 0.0)
        .orderBy("vec_id")),
    // DPR-style hard-negative mining: per query, the top-5 most-similar
    // vectors with a DIFFERENT label (the q28 broadcast scan shape
    // with a label-exclusion predicate)
    "q124_hard_negatives" -> ((s, dir) =>
      Similarity.hardNegatives(t(s, dir, "embeddings"),
        queryIds = (0L until 10L).toSeq, k = 5)
        .select(col("query_id"), col("neighbor_id"), col("neg_label"),
          col("sim"), col("rank").as("rnk"))
        .orderBy("query_id", "rnk")),
    // temperature-scaled source mixing weights at alpha = 0.5 — the
    // multilingual-LM anti-drowning sampler input
    "q125_temperature_weights" -> ((s, dir) =>
      Corpus.temperatureWeights(t(s, dir, "documents"))
        .orderBy("source")),
    // Flesch reading-ease: vowel-group syllable heuristic, q99
    // sentence segmentation — the classic readability curation feature
    "q129_readability" -> ((s, dir) =>
      TextAnalysis.readability(t(s, dir, "documents"))
        .orderBy("doc_id")),
    // bucketed Mann-Whitney AUC: does the q22 quality score separate
    // the src1* slice from the rest — the scorer-evaluation metric
    "q135_auc" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.aucScore(
        TextAnalysis.qualityScore(docs)
          .join(docs.select(col("doc_id"), col("source")), Seq("doc_id")),
        "quality", col("source").startsWith("src1"))
    }),
    // per-source quantile calibration of the q22 quality score — one
    // threshold means the same thing in every source afterwards
    "q131_calibrate_scores" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val scored = TextAnalysis.qualityScore(docs)
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      Corpus.calibrateScores(scored, "quality").orderBy("doc_id")
    }),
    // PMI collocation mining: high-PMI adjacent pairs are the phrases
    // worth fusing before tokenizer/embedding training
    "q130_collocations" -> ((s, dir) =>
      Corpus.collocations(t(s, dir, "documents"), minCount = 5, topN = 50)
        .orderBy(col("pmi").desc, col("t1"), col("t2"))),
    // PSI drift between the src1* slice and the rest over the q43
    // length histogram — the data-drift monitor
    "q126_psi_drift" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Corpus.psiDrift(
        base = docs.filter(!col("source").startsWith("src1")),
        current = docs.filter(col("source").startsWith("src1")))
        .orderBy("bucket")
    }),
    // pairwise label-centroid cosines: which classes are entangled in
    // embedding space (q123's companion, label-level)
    "q127_label_confusion" -> ((s, dir) =>
      Similarity.labelConfusion(t(s, dir, "embeddings"))
        .orderBy("label_a", "label_b")),
    // waterfilling source caps: one exact integer cap over the sorted
    // per-source token counts spends the 24k budget without letting
    // any source dominate — no driver loop, model-sized windows
    "q128_source_caps" -> ((s, dir) =>
      Corpus.sourceCaps(t(s, dir, "documents"), budgetTokens = 24000L)
        .orderBy("source")),
    // corpus vocabulary (tokenizer-training input): token frequency +
    // document frequency, global top-k via TakeOrderedAndProject
    "q62_vocab" -> ((s, dir) =>
      TextAnalysis.vocab(t(s, dir, "documents"))
        .orderBy(col("n_occurrences").desc, col("token").asc)
        .limit(50)),
    // the registered native expression through the SQL surface
    // (GraftExtensions → dot_product in whole-stage codegen)
    "q61_sql_dot" -> ((s, dir) => {
      graft.functions.GraftExtensions.register(s)
      t(s, dir, "embeddings").createOrReplaceTempView("embeddings")
      s.sql(
        """SELECT vec_id, label, dot_product(embedding, embedding) AS norm_sq
          |FROM embeddings ORDER BY vec_id""".stripMargin)
    }),
    // per-key top-k through the bounded-buffer TopK aggregator —
    // partial aggregation ships ≤ k rows per key per map task instead
    // of the window-rank full shuffle+sort of the fact table
    "q59_topk_per_key" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(graft.functions.TopK.topK(3, col("o_totalprice"),
          col("o_orderkey")).as("top"))
        .select(col("o_orderpriority"), posexplode(col("top")).as(Seq("pos", "s")))
        .select(col("o_orderpriority"),
          (col("pos") + 1).cast("long").as("rnk"),
          col("s.id").as("o_orderkey"),
          col("s.ord").as("o_totalprice"))
        .orderBy("o_orderpriority", "rnk")),
    // exact percentiles (linear interpolation)
    "q47_percentiles" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(percentile(col("o_totalprice"), lit(0.5)).as("median"),
          percentile(col("o_totalprice"), lit(0.9)).as("p90"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")),
    // sketch-based quantiles — the 100 TB path (exact percentile needs
    // a per-group sort; the t-digest-style sketch merges map-side).
    // Oracle-checkable columns are the exact quantiles plus the
    // contract that the sketch landed within 1% of each (q38's HLL
    // pattern): the sketch estimate itself is engine-specific
    "q77_approx_percentiles" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(percentile(col("o_totalprice"), lit(0.5)).as("median"),
          percentile(col("o_totalprice"), lit(0.9)).as("p90"),
          percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("__am"),
          percentile_approx(col("o_totalprice"), lit(0.9), lit(10000)).as("__a90"),
          count(lit(1)).as("n"))
        .select(col("o_orderpriority"), col("median"), col("p90"), col("n"),
          (abs(col("__am") - col("median")) <= col("median") * 0.01).as("median_close"),
          (abs(col("__a90") - col("p90")) <= col("p90") * 0.01).as("p90_close"))
        .orderBy("o_orderpriority")),
    // IVF ANN, deterministic coarse quantizer (sign-plane cells +
    // grid-quantized centroids): the COMPLETE pipeline — build →
    // ivfWrite (partitioned by cell) → ivfRead → partition-pruned
    // probe — is hash-checked against annIvfOracle. The KMeans
    // quantizer stays the quality path, contracted by q58.
    "q39_ann_ivf" -> ((s, dir) => {
      val idx = Similarity.ivfBuildDeterministic(
        t(s, dir, "embeddings"), planes = 4, dim = 64)
      val path = java.nio.file.Files.createTempDirectory("graft-q39-ivf").toString
      Similarity.ivfWrite(idx, path)
      Similarity.ivfQuery(Similarity.ivfRead(s, path),
          queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 3, nProbe = 2)
        .orderBy("query_id", "rank")
    }),
    // incremental index growth: build on 2/3 of the corpus, append the
    // rest into the persisted cell partitions, query — the oracle is
    // the FULL-corpus IVF probe (append ≡ rebuild, exactly)
    "q109_ivf_append" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val path = java.nio.file.Files.createTempDirectory("graft-q109-ivf").toString
      Similarity.ivfWrite(Similarity.ivfBuildDeterministic(
        emb.filter(col("vec_id") % 3 =!= 0), planes = 4, dim = 64), path)
      Similarity.ivfAppendWrite(path,
        emb.filter(col("vec_id") % 3 === 0), planes = 4, dim = 64)
      Similarity.ivfQuery(Similarity.ivfRead(s, path),
          queryIds = Seq(5L, 6L, 7L, 8L, 9L), k = 3, nProbe = 2)
        .orderBy("query_id", "rank")
    }),
    // index DELETE lifecycle: persist the full index, tombstone every
    // vec_id % 7 == 3, compact (affected-cell rewrite + exact partial
    // subtraction), probe — the oracle is the survivor-corpus probe
    // (delete ≡ rebuild on survivors, exactly)
    "q134_ivf_delete" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val path = java.nio.file.Files.createTempDirectory("graft-q134-ivf").toString
      Similarity.ivfWrite(Similarity.ivfBuildDeterministic(
        emb, planes = 4, dim = 64), path)
      Similarity.ivfDeleteWrite(path,
        emb.filter(col("vec_id") % 7 === 3).select("vec_id"))
      Similarity.ivfCompactDeletes(s, path)
      Similarity.ivfQuery(Similarity.ivfRead(s, path),
          queryIds = Seq(5L, 6L, 7L, 8L, 9L), k = 3, nProbe = 2)
        .orderBy("query_id", "rank")
    }),
    // IVF quality harness: the KMeans cells are engine-specific, but
    // two properties of the probe are engine-portable and asserted
    // cross-engine — it answers exactly k hits per query, and every
    // hit is a genuine near neighbor: within the exact top
    // max(40, 5% of corpus), brute-forced in Spark (observed worst
    // exact rank: 17 at sf0.01, 53 at sf0.1 — ≈2× margin at both)
    "q58_ann_ivf_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qids = Seq(0L, 1L, 2L, 3L, 4L)
      val bound = math.max(40L, math.ceil(emb.count() * 0.05).toLong)
      val ivf = Similarity.ivfTopK(emb, queryIds = qids, k = 3, nLists = 8, nProbe = 2)
      val exact = Similarity.cosineTopK(
        emb.filter(col("vec_id").isin(qids: _*)), emb, k = bound.toInt)
      ivf.join(
          exact.select(col("query_id"), col("neighbor_id"), col("rank").as("exact_rank")),
          Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_hits"),
          (count(col("exact_rank")) === count(lit(1))).as("all_hits_near"))
        .orderBy("query_id")
    }),
    // product quantization, deterministic codebook: per-(vector,
    // subspace) code + exact squared reconstruction error — the
    // compression audit a 64x-smaller PQ corpus ships with
    "q84_pq_codes" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val idx = Similarity.pqBuild(emb)
      Similarity.pqReconstructionError(emb, idx)
        .select(col("vec_id"), col("m").cast("long").as("m"),
          col("code").cast("long").as("code"), col("sq_err"))
        .orderBy("vec_id", "m")
    }),
    // PQ asymmetric-distance top-k: the corpus is scored from its
    // CODES via a broadcast (query, subspace, code) lookup table —
    // the scan never touches raw floats
    // FAISS-style IVF-PQ: probe nProbe deterministic cells, ADC-score
    // only the candidate codes — cell-pruned AND codes-only corpus read
    "q94_ivfpq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val ivf = Similarity.ivfBuildDeterministic(emb, planes = 4, dim = 64)
      val pq = Similarity.pqBuild(emb)
      Similarity.ivfPqTopK(emb, ivf, pq,
          queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 3, nProbe = 2)
        .orderBy("query_id", "rank")
    }),
    // IVF-PQ recall contract — the q58 harness over the composed
    // TRAINED serving path (KMeans coarse quantizer + per-subspace-
    // KMeans codebook + ADC shortlist + exact refine): k hits per
    // query, every hit inside the exact top max(80, 10% of corpus)
    // brute-forced in Spark — the number a user tuning
    // (nProbe, m, planes, refine) needs. Without the refine stage the
    // ADC quantization error alone blows the band (observed worst
    // exact rank 257/500 unrefined vs inside-band refined).
    "q102_ivfpq_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qids = Seq(0L, 1L, 2L, 3L, 4L)
      val bound = math.max(80L, math.ceil(emb.count() * 0.10).toLong)
      val ivf = Similarity.ivfBuild(emb, nLists = 8)
      val pq = Similarity.pqBuildKMeans(emb)
      val ann = Similarity.ivfPqTopK(emb, ivf, pq, qids, k = 3, nProbe = 2,
        refine = 32)
      val exact = Similarity.cosineTopK(
        emb.filter(col("vec_id").isin(qids: _*)), emb, k = bound.toInt)
      ann.join(
          exact.select(col("query_id"), col("neighbor_id"),
            col("rank").as("exact_rank")),
          Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_hits"),
          (count(col("exact_rank")) === count(lit(1))).as("all_hits_near"))
        .orderBy("query_id")
    }),
    "q85_pq_adc" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val idx = Similarity.pqBuild(emb)
      Similarity.pqAdcTopK(emb, idx, queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 3)
        .orderBy("query_id", "rank")
    }),
    "q30_neardup_cosine" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").filter(col("vec_id") % 4 === 0)
      Similarity.nearDupPairs(emb, threshold = -2.0)
        .orderBy(col("sim").desc, col("id_a"), col("id_b"))
        .limit(20)
    }),
    // symmetric int8 quantization of the embedding column — the 4×
    // storage form of a vector corpus; scalar outputs pin every
    // component (checksum) and the worst reconstruction error
    "q66_quantize" -> ((s, dir) =>
      Similarity.quantizeInt8(t(s, dir, "embeddings"))
        .orderBy("vec_id")),
    // per-dimension embedding moments on the exact-integer grid —
    // the standardization/dead-dim statistics pass, order-free sums
    "q145_dim_stats" -> ((s, dir) =>
      Similarity.dimStats(t(s, dir, "embeddings"))
        .orderBy("dim")),
    // covariance matrix on the same grid (upper triangle) — the
    // PCA/whitening input, d(d+1)/2 model-sized exact output
    "q149_covariance" -> ((s, dir) =>
      Similarity.covarianceMatrix(t(s, dir, "embeddings"))
        .orderBy("p", "q")),
    // per-dimension exact median — the robust-scaling statistic via
    // the q105 histogram quantile keyed by dimension
    "q151_dim_median" -> ((s, dir) =>
      Similarity.dimQuantiles(t(s, dir, "embeddings"), p = 0.5)
        .orderBy("dim")),
    // retention cohort matrix over the events table: first-activity
    // day cohorts × return-day offsets
    "q152_retention" -> ((s, dir) =>
      graft.streaming.EventStreams.retentionCohorts(t(s, dir, "events"))
        .orderBy("cohort", "day_offset")),
    // RFM segment census: exact tercile cutpoints per dimension via
    // the q105 histogram order statistic, 27-cell output
    "q153_rfm_segments" -> ((s, dir) =>
      graft.streaming.EventStreams.rfmSegments(t(s, dir, "events"))
        .orderBy("r_bucket", "f_bucket", "m_bucket")),
    // per-source KL from the corpus token distribution — the
    // source-distinctiveness ranking (tokenDrift's one-vs-all form)
    "q159_source_divergence" -> ((s, dir) =>
      Corpus.sourceDivergence(t(s, dir, "documents"))
        .orderBy("source")),
    // Unicode-safe normalization: NFC + every script's letters/digits
    // survive (q40's ASCII scrub erases them)
    "q160_scrub_unicode" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.scrubUnicode(col("text")).as("clean"))
        .orderBy("doc_id")),
    // high-entropy secret scan over the fixture's longest tokens:
    // division-free n·H score in exact decimals, threshold 2.0 nats
    // (an 8-char all-distinct token scores ln 8 ≈ 2.079, any repeat
    // drops below 2.0 — the contract separates exactly there)
    "q162_secret_scan" -> ((s, dir) =>
      TextAnalysis.secretScan(t(s, dir, "documents"),
          minLen = 8, entropyPerChar = 2.0)
        .orderBy("doc_id", "pos")),
    // language-ID confidence margin: argmax + runner-up + the exact-
    // decimal margin >= 50-nat gate (raw margin unhashed, q150's rule)
    "q163_langid_margin" -> ((s, dir) =>
      TextAnalysis.langIdMargin(t(s, dir, "documents"),
          confidenceMargin = 50.0)
        .orderBy("doc_id")),
    // unigram-tokenizer inference: Viterbi pieces mapped to dense ids
    // (piece-ASC ranks) — bpeEncode's twin for the other family
    "q164_unigram_encode" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val vocab = Corpus.unigramSeedVocab(docs).localCheckpoint()
      Corpus.unigramEncode(docs.filter(col("doc_id") < 50), vocab)
        .orderBy("doc_id", "pos", "piece_idx")
    }),
    // per-dim winsorization at exact [0.05, 0.95] order statistics
    "q165_winsorize" -> ((s, dir) =>
      Similarity.winsorizeEmbeddings(t(s, dir, "embeddings"))
        .orderBy("vec_id", "dim")),
    // robust (median/IQR) per-dim standardization — outlier-immune
    "q178_robust_standardize" -> ((s, dir) =>
      Similarity.robustStandardize(t(s, dir, "embeddings"))
        .orderBy("vec_id", "dim")),
    // per-source fit under the corpus bigram LM — the domain-mixture
    // reweighting signal (which sources the corpus models poorly)
    "q166_source_lm_fit" -> ((s, dir) =>
      Corpus.sourceBigramFit(t(s, dir, "documents"))
        .orderBy("source")),
    // per-source vocabulary census: types, hapax, exact ratios —
    // the Heaps'-law / OCR-garbage health report
    "q167_vocab_growth" -> ((s, dir) =>
      Corpus.vocabularyGrowth(t(s, dir, "documents"))
        .orderBy("source")),
    // Good-Turing count-of-counts over the corpus bigram table
    "q168_count_of_counts" -> ((s, dir) =>
      Corpus.countOfCounts(t(s, dir, "documents"))
        .orderBy("c")),
    // exact-integer lazy PageRank over the LSH candidate graph —
    // near-dup hub centrality, bit-identical in any engine
    "q169_pagerank" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.candidatePairs(
        Dedup.lshBands(Dedup.minhash(docs, k = 6), bands = 3, rowsPerBand = 2))
      Dedup.pagerankCentrality(pairs, docs).orderBy("doc_id")
    }),
    // trigram Kneser-Ney: the production perplexity-filter depth,
    // lower orders derived hierarchically from the trigram types
    "q176_kn_trigram" -> ((s, dir) =>
      Corpus.kneserNeyTrigramLogProb(t(s, dir, "documents"))
        .orderBy("doc_id")),
    // Luhn-checksummed card scan: every doc gets a synthesized VALID
    // 16-digit number and its off-by-one INVALID sibling planted in
    // the text; the scan must extract both and verdict them apart
    "q177_card_scan" -> ((s, dir) => {
      val prefix = concat(lit("4"),
        lpad(pmod(col("doc_id") * 31 + 7, lit(100000000000000L)).cast("string"), 14, "0"))
      val s15 = aggregate(sequence(lit(1), lit(15)), lit(0L), (acc, i) => {
        val d = (ascii(prefix.substr(i, lit(1))) - 48).cast("long")
        val dd = when(pmod(lit(16) - i, lit(2)) === 1, d * 2).otherwise(d)
        acc + when(dd > 9L, dd - 9L).otherwise(dd)
      })
      val check = pmod(lit(10L) - pmod(s15, lit(10L)), lit(10L))
      val planted = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit(" "), prefix, check.cast("string"),
          lit(" "), prefix, pmod(check + 1, lit(10L)).cast("string")).as("text"))
      TextAnalysis.cardScan(planted).orderBy("doc_id", "candidate")
    }),
    // shard manifest: per-shard counts + order-free id checksum
    "q170_shard_manifest" -> ((s, dir) =>
      Corpus.shardManifest(t(s, dir, "documents"), nShards = 8)
        .orderBy("shard")),
    // char-bigram entropy compressibility proxy (n·H exact decimals)
    "q171_compressibility" -> ((s, dir) =>
      TextAnalysis.compressibility(t(s, dir, "documents"))
        .orderBy("doc_id")),
    // duplicate-cluster source census: mirror vs boilerplate report
    "q172_cluster_sources" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.candidatePairs(
        Dedup.lshBands(Dedup.minhash(docs, k = 6), bands = 3, rowsPerBand = 2))
      Dedup.clusterSourceCensus(docs, pairs).orderBy("comp")
    }),
    // REAL PCM decode: synthesized canonical 16-bit mono WAVs, stats
    // recovered sample-by-sample from the bytes; the oracle recomputes
    // the builder formulas arithmetically
    "q173_wav_stats" -> ((s, dir) => {
      def leHex(v: Column, nBytes: Int): Column = concat(
        (0 until nBytes).map(i =>
          lpad(hex(pmod(floor(v / math.pow(256, i)).cast("long"), lit(256L))), 2, "0")): _*)
      val n = (col("doc_id") % 32 + 64).cast("long")         // samples
      val sr = (col("doc_id") % 3 * 8000 + 16000).cast("long") // rate
      val dataLen = n * 2
      val samples = array_join(transform(sequence(lit(0L), n - 1),
        ii => leHex(pmod(col("doc_id") * 31 + ii * 17, lit(65536L)), 2)), "")
      val payload = unhex(concat(
        lit("52494646"), leHex(dataLen + 36L, 4), lit("57415645"),
        lit("666D7420"), leHex(lit(16L), 4), leHex(lit(1L), 2), leHex(lit(1L), 2),
        leHex(sr, 4), leHex(sr * 2, 4), leHex(lit(2L), 2), leHex(lit(16L), 2),
        lit("64617461"), leHex(dataLen, 4), samples))
      // materialize the synthesized payloads: every byte probe below
      // would otherwise inline (and recompute) the hex-build tree
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), payload.as("payload"))
        .localCheckpoint()
      media.select(col("media_id"),
          Multimodal.wavAudioStats(col("payload")).as("a"))
        .select(col("media_id"), col("a.duration_ms"), col("a.n_prefix"),
          col("a.peak_abs"), col("a.sum_abs"))
        .orderBy("media_id")
    }),
    // REAL pixel decode: 16×16 24-bit BMPs with formula pixels, the
    // perceptual dHash recovered from the decoded bytes — the oracle
    // computes the same 64 gradient bits from the formula directly
    "q174_bmp_dhash" -> ((s, dir) => {
      def leHex(v: Column, nBytes: Int): Column = concat(
        (0 until nBytes).map(i =>
          lpad(hex(pmod(floor(v / math.pow(256, i)).cast("long"), lit(256L))), 2, "0")): _*)
      // pixel value v(x, y) = (doc_id*7 + x*13 + y*31) % 256, b=g=r=v;
      // rows stored bottom-up, stride 48 (16·3, already 4-aligned)
      val rows = array_join(transform(sequence(lit(15L), lit(0L), lit(-1L)), y =>
        array_join(transform(sequence(lit(0L), lit(15L)), x =>
          repeat(lpad(hex(pmod(col("doc_id") * 7 + x * 13 + y * 31, lit(256L))), 2, "0"), 3)),
          "")), "")
      val payload = unhex(concat(
        lit("424D"), leHex(lit(822L), 4), lit("00000000"), leHex(lit(54L), 4),
        leHex(lit(40L), 4), leHex(lit(16L), 4), leHex(lit(16L), 4),
        leHex(lit(1L), 2), leHex(lit(24L), 2), leHex(lit(0L), 4),
        leHex(lit(768L), 4), leHex(lit(2835L), 4), leHex(lit(2835L), 4),
        leHex(lit(0L), 4), leHex(lit(0L), 4), rows))
      // materialize first: the dHash reads ~400 byte positions and the
      // hex-build tree inlined into each would explode the plan
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), payload.as("payload"))
        .localCheckpoint()
      media.select(col("media_id"),
          Multimodal.bmpMeta(col("payload")).as("m"),
          Multimodal.bmpDhash(col("payload")).as("dhash"))
        .select(col("media_id"), col("m.width").as("width"),
          col("m.height").as("height"), col("dhash"))
        .orderBy("media_id")
    }),
    // perceptual image near-dup end to end on real pixels: 25
    // repeating BMP patterns → dHash → pigeonhole-blocked pairs
    "q175_image_neardup" -> ((s, dir) => {
      def leHex(v: Column, nBytes: Int): Column = concat(
        (0 until nBytes).map(i =>
          lpad(hex(pmod(floor(v / math.pow(256, i)).cast("long"), lit(256L))), 2, "0")): _*)
      val pat = pmod(col("doc_id"), lit(25L))
      val rows = array_join(transform(sequence(lit(15L), lit(0L), lit(-1L)), y =>
        array_join(transform(sequence(lit(0L), lit(15L)), x =>
          repeat(lpad(hex(pmod(pat * 7 + x * 13 + y * 31, lit(256L))), 2, "0"), 3)),
          "")), "")
      val payload = unhex(concat(
        lit("424D"), leHex(lit(822L), 4), lit("00000000"), leHex(lit(54L), 4),
        leHex(lit(40L), 4), leHex(lit(16L), 4), leHex(lit(16L), 4),
        leHex(lit(1L), 2), leHex(lit(24L), 2), leHex(lit(0L), 4),
        leHex(lit(768L), 4), leHex(lit(2835L), 4), leHex(lit(2835L), 4),
        leHex(lit(0L), 4), leHex(lit(0L), 4), rows))
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), payload.as("payload"))
        .localCheckpoint()
      Multimodal.imageNearDupPairs(media).orderBy("doc_a", "doc_b")
    }),
    // REAL PNG pixel decode: spec-valid PNGs with zlib STORED blocks
    // (exact adler32) and the per-row filter type cycling through ALL
    // FIVE PNG filters (None/Sub/Up/Average/Paeth) — the kernel must
    // inflate AND invert each filter to recover q174's formula
    // pixels; the oracle predicts the dHash from the formula. The 25
    // pattern payloads assemble DRIVER-SIDE (a per-row Spark-HOF
    // build spends 18 s of pure fixture cost at sf0.1; the q182
    // broadcast-join shape spends none)
    "q179_png_dhash" -> ((s, dir) => {
      import s.implicits._
      def buildPng(p: Long): Array[Byte] = {
        def v(x: Int, y: Int): Int = ((p * 7 + x * 13 + y * 31) % 256).toInt
        val stream = (0 until 16).flatMap { y =>
          val ft = y % 5
          ft.toByte +: (0 until 48).map { i =>
            val x = i / 3
            val raw = v(x, y)
            val left = if (x > 0) v(x - 1, y) else 0
            val up = if (y > 0) v(x, y - 1) else 0
            val ul = if (x > 0 && y > 0) v(x - 1, y - 1) else 0
            val pred = ft match {
              case 0 => 0
              case 1 => left
              case 2 => up
              case 3 => (left + up) >> 1
              case _ =>
                val pp = left + up - ul
                val (pa, pb, pc) =
                  (math.abs(pp - left), math.abs(pp - up), math.abs(pp - ul))
                if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
            }
            ((raw - pred) & 0xff).toByte
          }
        }.toArray
        var s1 = 1L; var s2 = 0L
        stream.foreach { d =>
          s1 = (s1 + (d & 0xff)) % 65521; s2 = (s2 + s1) % 65521
        }
        def be(x: Long, n: Int): Array[Byte] =
          Array.tabulate(n)(i => ((x >> (8 * (n - 1 - i))) & 0xff).toByte)
        Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
          be(13, 4) ++ "IHDR".getBytes ++ be(16, 4) ++ be(16, 4) ++
          Array[Byte](8, 2, 0, 0, 0) ++ be(0, 4) ++
          be(2 + 5 + stream.length + 4, 4) ++ "IDAT".getBytes ++
          Array[Byte](0x78, 0x01, 0x01) ++                // zlib + stored-final
          Array[Byte](0x10, 0x03, 0xef.toByte, 0xfc.toByte) ++ // LEN/NLEN LE
          stream ++ be(s2 * 65536 + s1, 4) ++ be(0, 4) ++
          be(0, 4) ++ "IEND".getBytes ++ be(0, 4)
      }
      val patDf = (0L until 25L).map(p => (p, buildPng(p))).toDF("pat", "payload")
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          pmod(col("doc_id"), lit(25L)).as("pat"))
        .join(broadcast(patDf), Seq("pat"))
      media.select(col("media_id"),
          Multimodal.pngMeta(col("payload")).as("m"),
          Multimodal.pngDhash(col("payload")).as("dhash"))
        .select(col("media_id"), col("m.width").as("width"),
          col("m.height").as("height"), col("dhash"))
        .orderBy("media_id")
    }),
    // script-aware tokenization on a planted mixed-script corpus: CJK/
    // Thai codepoints (picked from a fixed 12-char alphabet by doc_id
    // arithmetic) become per-codepoint tokens — the multilingual vocab
    // a whitespace tokenizer collapses into one blob per document; the
    // oracle reproduces the fallback with RE2 script classes
    "q180_cjk_vocab" -> ((s, dir) => {
      val abc = Seq("漢", "字", "図", "本", "の", "が",
        "ア", "ト", "한", "국", "ไ", "ท")
      val cjk = array(abc.map(lit): _*)
      def pick(k: Int) =
        element_at(cjk, (pmod(col("doc_id") * k, lit(12L)) + 1).cast("int"))
      val planted = t(s, dir, "documents").select(col("doc_id"),
        concat_ws(" ",
          substring(col("text"), 1, 30),
          concat(pick(1), pick(5), pick(7)),
          concat(lit("mix"), pick(3), lit("ed"))).as("text"))
      TextAnalysis.vocab(planted, scriptAware = true).orderBy("token")
    }),
    // audio near-dup end to end on real PCM: 25 repeating waveforms,
    // each doc's copy GAIN-SHIFTED by doc_id%3+1 — the sign-of-delta
    // fingerprint is gain-invariant, so same-pattern docs pair at
    // hamming 0 while the oracle predicts the bits from the base
    // waveform formula directly
    "q181_audio_neardup" -> ((s, dir) => {
      def leHex(v: Column, nBytes: Int): Column = concat(
        (0 until nBytes).map(i =>
          lpad(hex(pmod(floor(v / math.pow(256, i)).cast("long"), lit(256L))), 2, "0")): _*)
      val pat = pmod(col("doc_id"), lit(25L))
      val gain = pmod(col("doc_id"), lit(3L)) + 1
      val n = lit(128L)
      // base waveform in [-100, 100]; the stored sample is base·gain
      val samples = array_join(transform(sequence(lit(0L), n - 1), ii =>
        leHex(pmod((pmod(pat * 31 + ii * 17, lit(201L)) - 100) * gain,
          lit(65536L)), 2)), "")
      val dataLen = n * 2
      val payload = unhex(concat(
        lit("52494646"), leHex(dataLen + 36L, 4), lit("57415645"),
        lit("666D7420"), leHex(lit(16L), 4), leHex(lit(1L), 2), leHex(lit(1L), 2),
        leHex(lit(16000L), 4), leHex(lit(32000L), 4), leHex(lit(2L), 2),
        leHex(lit(16L), 2), lit("64617461"), leHex(dataLen, 4), samples))
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), payload.as("payload"))
        .localCheckpoint()
      Multimodal.audioNearDupPairs(media).orderBy("doc_a", "doc_b")
    }),
    // REAL JPEG pixel decode (natively since round 15 — the pinned
    // integer contract): 25 pattern JPEGs encoded DRIVER-SIDE
    // (javax.imageio writes them; the ENGINE decodes them),
    // block-aligned so the lossy round-trip preserves the dHash
    // exactly and patterns sit >=12 bits apart; the oracle pins PAIR
    // STRUCTURE (same-pattern copies at hamming 0) — q335 pins the
    // VALUES the native decoder makes engine-exact
    "q182_jpeg_neardup" -> ((s, dir) => {
      import s.implicits._
      val pats = (0 until 25).map { p =>
        // 9x8 constant 8x8-px blocks; V walks +-12 per bit of the
        // code C_p: bit k = (p >> (k % 5)) & 1 — distinct p differ in
        // >=12 grid comparisons, far outside the hamming-3 radius
        val img = new java.awt.image.BufferedImage(
          72, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (r <- 0 until 8) {
          val v = new Array[Int](9)
          v(0) = 128
          for (i <- 0 until 8)
            v(i + 1) = v(i) + (if (((p >> ((8 * r + i) % 5)) & 1) == 1) 12 else -12)
          for (c <- 0 until 9; y <- r * 8 until r * 8 + 8;
               x <- c * 8 until math.min(c * 8 + 8, 72))
            img.setRGB(x, y, (v(c) << 16) | (v(c) << 8) | v(c))
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        (p.toLong, bos.toByteArray)
      }
      val patDf = pats.toDF("pat", "payload")
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          pmod(col("doc_id"), lit(25L)).as("pat"))
        .join(broadcast(patDf), Seq("pat"))
        .select("media_id", "payload")
      Multimodal.imageNearDupPairs(media).orderBy("doc_a", "doc_b")
    }),
    // HTML -> text extraction on planted markup: style/script blocks
    // (with content) dropped, tags to spaces, the six core entities
    // decoded amp-last, whitespace collapsed — the step before every
    // other text operator on a web crawl
    "q183_html_extract" -> ((s, dir) => {
      // numeric char refs (decimal, hex, uppercase-X hex, &#160;),
      // escaped entities that must NOT double-decode (&#38;lt;),
      // out-of-BMP + surrogate refs that stay literal, and an
      // UPPERCASE MULTI-LINE script block that must drop with content
      val html = concat(
        lit("<html><head><title>T</title><style>body{color:red}</style>" +
          "</head><body><h1 class=\"hd\">"),
        substring(col("text"), 1, 20),
        lit("</h1><p>"), substring(col("text"), 21, 40),
        lit(" &amp; more &lt;tags&gt;&nbsp;end</p>" +
          "<p>it&#8217;s &#x27;q&#X6F; n&#160;b &#38;lt; &#999999; &#xD800;</p>" +
          "<SCRIPT>\nvar x = \"<p>\";\n</SCRIPT></body></html>"))
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.htmlToText(html).as("clean"))
        .orderBy("doc_id")
    }),
    // URL canonicalization + registrable-host extraction on planted
    // crawl URLs: mixed-case scheme/host, default ports, trailing
    // slashes, utm_* params and fragments all normalize away
    "q184_url_normalize" -> ((s, dir) => {
      val url = concat(
        lit("HTTPS://WWW.Site"), pmod(col("doc_id"), lit(7L)).cast("string"),
        lit(".Example.COM"),
        when(pmod(col("doc_id"), lit(3L)) === 0, lit(":443")).otherwise(lit("")),
        lit("/Path/"), col("doc_id").cast("string"),
        when(pmod(col("doc_id"), lit(2L)) === 0, lit("/")).otherwise(lit("")),
        lit("?utm_source=feed&ref=abc&utm_campaign=x#section-2"))
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.urlNormalize(url).as("url"),
          TextAnalysis.urlDomain(url).as("domain"))
        .orderBy("doc_id")
    }),
    // DoReMi-flavored mixture budgeting: per-source excess loss under
    // the corpus bigram LM (q166) → exact integer-weighted token
    // budgets — worst-fit domains get the most tokens
    "q185_doremi_budgets" -> ((s, dir) =>
      Corpus.doremiBudgets(t(s, dir, "documents"), totalBudget = 1000000L)
        .orderBy("source")),
    // WordPiece training: likelihood-scored merges (count(l,r) /
    // (count(l)·count(r))) over ##-marked symbols — BPE's q113 loop
    // with the BERT scoring rule; the score double is exact IEEE
    // division of exact int64 counts, engine-identical
    "q186_wordpiece_train" -> ((s, dir) =>
      Corpus.wordpieceTrain(t(s, dir, "documents"), numMerges = 8)
        .orderBy("rank")),
    // the encode half: greedy longest-match-first against the trained
    // vocabulary (alphabet + merged symbols) — BERT's inference rule,
    // deliberately NOT a replay of the training segmentation; one
    // native codegen'd pass over the distinct-word table
    "q187_wordpiece_encode" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = Corpus.wordpieceTrain(docs, numMerges = 8)
        .orderBy("rank").select("left_sym", "right_sym")
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      val vocab = Corpus.wordpieceVocab(docs, merges)
      Corpus.wordpieceEncode(docs.filter(col("doc_id") < 50), vocab)
        .orderBy("doc_id", "pos", "piece_idx")
    }),
    // mojibake repair roundtrip (ftfy's core case): plant non-ASCII
    // decorations, corrupt by reading the UTF-8 bytes as Latin-1
    // (twice for doc_id%3==0 — double encoding), then repair. The
    // unwind is exact, so the oracle states rounds and the repaired
    // text from the CLEAN side — the corruption must vanish entirely
    "q188_fix_mojibake" -> ((s, dir) => {
      val variant = element_at(
        array(lit("ü"), lit("ñ"), lit("ā"), lit("ž")),
        (pmod(col("doc_id"), lit(4L)) + 1).cast("int"))
      val clean = concat(substring(col("text"), 1, 40),
        lit(" café — “q” € "), variant)
      def corrupt(c: Column) = decode(encode(c, "UTF-8"), "ISO-8859-1")
      val garbled = when(pmod(col("doc_id"), lit(3L)) === 0,
        corrupt(corrupt(clean))).otherwise(corrupt(clean))
      TextAnalysis.mojibakeRepair(
          t(s, dir, "documents").select(col("doc_id"), garbled.as("text")))
        .orderBy("doc_id")
    }),
    // script census over planted mixed-script docs: a Latin prefix
    // plus a tripled pure-script snippet per doc_id%5 — the snippet
    // outweighs the prefix, so dominant rotates through the scripts
    "q190_script_census" -> ((s, dir) => {
      val snippet = element_at(array(
        lit("漢字漢字漢字漢字漢字漢字"),
        lit("Русский текст про язык"),
        lit("النص العربي للاختبار"),
        lit("ทดสอบภาษาไทยสั้น"),
        lit("ελληνικό κείμενο εδώ")),
        (pmod(col("doc_id"), lit(5L)) + 1).cast("int"))
      val mixed = concat(substring(col("text"), 1, 30), lit(" "),
        repeat(snippet, 3))
      TextAnalysis.scriptCensus(
          t(s, dir, "documents").select(col("doc_id"), mixed.as("text")))
        .orderBy("doc_id")
    }),
    // per-domain reputation: planted URLs key 7 domains; domains 0/1
    // get a third of their docs replaced by one syndicated string
    // (within-domain md5 dup groups) -> dup_rate 24/72 > 0.30 drops
    // them; domain 2 is healthy but oversized (72 > 71) -> cap; the
    // rest keep. Content-farm gating at domain grain, not doc grain
    "q189_domain_reputation" -> ((s, dir) => {
      val dom = pmod(col("doc_id"), lit(7L))
      val url = concat(lit("https://site"), dom.cast("string"),
        lit(".example.com/p/"), col("doc_id").cast("string"))
      val text2 = when(dom < 2 && pmod(col("doc_id"), lit(3L)) === 0,
          lit("Syndicated press release reposted verbatim across the network."))
        .otherwise(col("text"))
      TextAnalysis.domainReputation(
          t(s, dir, "documents")
            .select(col("doc_id"), url.as("url"), text2.as("text")),
          capDocs = 71L)
        .orderBy("domain")
    }),
    // C4 line-level cleaning over synthesized multi-line pages: four
    // planted lines exercise every line rule (short / good /
    // javascript / unterminated) and a doc_id%13 rotation trips each
    // page gate (lorem ipsum, brace, blocklist) on a slice
    "q192_c4_clean" -> ((s, dir) => {
      val gate = pmod(col("doc_id"), lit(13L))
      val page = concat_ws("\n",
        substring(col("text"), 1, 120),
        lit("Too short."),
        lit("This line carries enough words and ends with a period."),
        lit("This javascript line carries enough words and ends with a period."),
        lit("This line carries plenty of words but never terminates"),
        when(gate === 0, lit("Operators love lorem ipsum filler inside their pages."))
          .when(gate === 1, lit("A brace { sneaks into this otherwise fine sentence."))
          .when(gate === 2, lit("The casino word trips the page blocklist gate here."))
          .otherwise(lit("A perfectly ordinary closing sentence finishes the page.")))
      TextAnalysis.c4Clean(
          t(s, dir, "documents").select(col("doc_id"), page.as("text")))
        .orderBy("doc_id")
    }),
    // recrawl collapse: 50 canonical URLs x ~10 surface-varied
    // snapshots (case, trailing slash, utm, fragment); ts = doc_id%100
    // forces within-group timestamp TIES so the length and id
    // tie-breaks are exercised on the oracle path, and doc_id%5 swaps
    // in an unchanged cached body so n_distinct_texts < n_snapshots
    "q193_url_dedup" -> ((s, dir) => {
      val url = concat(
        when(pmod(col("doc_id"), lit(2L)) === 0,
          lit("HTTPS://Recrawl")).otherwise(lit("https://recrawl")),
        pmod(col("doc_id"), lit(50L)).cast("string"), lit(".example.com/page"),
        when(pmod(col("doc_id"), lit(3L)) === 0, lit("/")).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(4L)) === 0,
          lit("?utm_source=x")).otherwise(lit("")),
        lit("#frag"))
      val text2 = when(pmod(col("doc_id"), lit(5L)) === 0,
        lit("Unchanged cached snapshot body.")).otherwise(col("text"))
      TextAnalysis.urlDedup(
          t(s, dir, "documents").select(col("doc_id"), url.as("url"),
            pmod(col("doc_id"), lit(100L)).as("ts"), text2.as("text")))
        .orderBy("url")
    }),
    // Gopher repetition signals over planted pages: every doc carries
    // a duplicated line inside paragraph A; doc_id%3==0 duplicates a
    // whole paragraph (B==C), so line-, char- and paragraph-grain
    // fractions all move; top-n fracs ride the natural text
    "q198_repetition_signals" -> ((s, dir) => {
      val dup3 = pmod(col("doc_id"), lit(3L)) === 0
      val paraA = concat_ws("\n", substring(col("text"), 1, 60),
        lit("Repeated boilerplate line."), lit("Repeated boilerplate line."))
      val paraB = when(dup3, lit("Syndicated paragraph body."))
        .otherwise(concat(lit("Unique middle paragraph "),
          col("doc_id").cast("string"), lit(".")))
      val paraC = when(dup3, lit("Syndicated paragraph body."))
        .otherwise(substring(col("text"), 61, 60))
      val page = concat_ws("\n\n", paraA, paraB, paraC)
      TextAnalysis.repetitionSignals(
          t(s, dir, "documents").select(col("doc_id"), page.as("text")))
        .orderBy("doc_id")
    }),
    // robots gate: 7 domains with distinct robots shapes (full
    // multi-section file / allow-all '*' / no '*' section) x 4 path
    // classes; '/tmp' prefix must catch '/tmp-file' (prefix, not
    // directory, semantics) and the gptbot/otherbot sections must not
    // leak into the wildcard rules
    "q197_robots_gate" -> ((s, dir) => {
      def robotsFor(d: Column) =
        when(d === "3", concat_ws("\n",
          lit("User-agent: *"), lit("Disallow:")))
        .when(d === "5", concat_ws("\n",
          lit("User-agent: gptbot"), lit("Disallow: /")))
        .otherwise(concat_ws("\n",
          lit("User-agent: gptbot"), lit("Disallow: /"),
          lit("User-agent: *"), lit("Disallow: /private/"),
          lit("Disallow: /tmp"),
          lit("User-agent: otherbot"), lit("Disallow: /public/")))
      val robots = t(s, dir, "documents")
        .select(pmod(col("doc_id"), lit(7L)).cast("string").as("__d")).distinct()
        .select(concat(lit("site"), col("__d"), lit(".example.com")).as("domain"),
          robotsFor(col("__d")).as("robots"))
      val m4 = pmod(col("doc_id"), lit(4L))
      val url = concat(lit("https://site"),
        pmod(col("doc_id"), lit(7L)).cast("string"), lit(".example.com"),
        when(m4 === 0, "/private/x").when(m4 === 1, "/public/y")
          .when(m4 === 2, "/tmp-file").otherwise("/ok/z"))
      TextAnalysis.robotsGate(
          t(s, dir, "documents").select(col("doc_id"), url.as("url")), robots)
        .orderBy("doc_id")
    }),
    // outlink extraction: per-doc HTML plants one absolute, one
    // root-relative, one protocol-relative link (all kept+resolved)
    // plus fragment/relative/mailto links (all dropped)
    "q196_extract_links" -> ((s, dir) => {
      val url = concat(lit("https://site"),
        pmod(col("doc_id"), lit(7L)).cast("string"), lit(".example.com/dir/page"))
      val html = concat(
        lit("<p>"), substring(col("text"), 1, 40), lit("</p>"),
        lit("<a href=\"https://ext"), pmod(col("doc_id"), lit(5L)).cast("string"),
        lit(".com/page?x=1\">a</a>"),
        lit("<A HREF=\"/local/"), col("doc_id").cast("string"), lit("\">b</A>"),
        lit("<a href=\"//cdn.shared.net/asset.js\">c</a>"),
        lit("<a href=\"#frag\">d</a><a href=\"relative.html\">e</a>" +
          "<a href=\"mailto:x@y.z\">f</a>"))
      TextAnalysis.extractLinks(
          t(s, dir, "documents").select(col("doc_id"), url.as("url"),
            html.as("html")))
        .orderBy("doc_id", "dst_url")
    }),
    // full RFC 3986 link resolution: path-relative hrefs (the
    // majority on real pages) merge against the base directory with
    // dot-segment removal; ./ ../ ../../../-past-root, ?query-only
    // and trailing-query forms all planted; javascript://, data:,
    // mailto: and #fragment links all dropped — the oracle derives
    // every expected edge arithmetically, independent of the regex
    // chain
    "q200_resolve_links" -> ((s, dir) => {
      val url = concat(lit("https://site"),
        pmod(col("doc_id"), lit(7L)).cast("string"),
        lit(".example.com/a/b/page.html"))
      val html = concat(
        lit("<p>"), substring(col("text"), 1, 30), lit("</p>"),
        lit("<a href=\"https://ext"), pmod(col("doc_id"), lit(5L)).cast("string"),
        lit(".com/page?x=1\">a</a>"),
        lit("<a href=\"page2.html\">b</a>" +
          "<a href=\"../up.html\">c</a>" +
          "<a href=\"./same/x\">d</a>" +
          "<a href=\"../../../root.html\">e</a>" +
          "<a href=\"img/pic.png?s=1\">f</a>" +
          "<a href=\"?page=2\">g</a>" +
          "<a href=\"//cdn.shared.net/asset.js\">h</a>" +
          "<a href=\"javascript://evil()\">i</a>" +
          "<a href=\"data:text/html,x\">j</a>" +
          "<a href=\"#frag\">k</a><a href=\"mailto:x@y.z\">l</a>"))
      TextAnalysis.extractLinks(
          t(s, dir, "documents").select(col("doc_id"), url.as("url"),
            html.as("html")),
          resolveRelative = true)
        .orderBy("doc_id", "dst_url")
    }),
    // canonical-aware recrawl collapse: every crawl URL is unique
    // (?v=doc_id), but docs with doc_id%3!=0 declare rel=canonical
    // "/page" — those collapse per domain group while the
    // non-declaring snapshots stay singles; the oracle plants the
    // post-canonical keys directly and replays the q193 pick
    "q205_canonical_dedup" -> ((s, dir) => {
      val m = pmod(col("doc_id"), lit(50L))
      val hasCanon = pmod(col("doc_id"), lit(3L)) =!= 0
      val url = concat(lit("https://canon"), m.cast("string"),
        lit(".example.com/page?v="), col("doc_id").cast("string"))
      val html = concat(lit("<html><head>"),
        when(hasCanon, lit("<link rel=\"canonical\" href=\"/page\">"))
          .otherwise(lit("")),
        lit("</head><body>"), substring(col("text"), 1, 30),
        lit("</body></html>"))
      val text2 = when(pmod(col("doc_id"), lit(5L)) === 0,
        lit("Stable canonical body.")).otherwise(col("text"))
      TextAnalysis.canonicalDedup(
          t(s, dir, "documents").select(col("doc_id"), url.as("url"),
            html.as("html"), pmod(col("doc_id"), lit(100L)).as("ts"),
            text2.as("text")))
        .orderBy("url")
    }),
    // corpus-level paragraph dedup: every page carries one
    // corpus-wide boilerplate paragraph and one group-shared banner
    // (both must drop everywhere) around document-unique content
    // (must survive in order); the oracle replays the split + df
    // count + ordered reassembly
    "q204_paragraph_dedup" -> ((s, dir) => {
      val page = concat_ws("\n\n",
        substring(col("text"), 1, 50),
        lit("Subscribe to our newsletter."),
        concat(lit("Shared group banner "),
          pmod(col("doc_id"), lit(5L)).cast("string"), lit(".")),
        concat(lit("Unique tail "), col("doc_id").cast("string"), lit(".")))
      TextAnalysis.paragraphDedup(
          t(s, dir, "documents").select(col("doc_id"), page.as("text")))
        .orderBy("doc_id")
    }),
    // page-metadata extraction: title with entities + a line break,
    // meta description in BOTH attribute orders, rel=canonical as
    // path-relative AND root-relative (resolved through the RFC 3986
    // merge), charset quoted/unquoted/uppercase — absent fields null;
    // the oracle derives every field arithmetically
    "q202_page_meta" -> ((s, dir) => {
      val m4 = pmod(col("doc_id"), lit(4L))
      val m5 = pmod(col("doc_id"), lit(5L))
      val url = concat(lit("https://site"),
        pmod(col("doc_id"), lit(7L)).cast("string"),
        lit(".example.com/a/b/page.html"))
      val title = concat(lit("<TITLE> Doc "), col("doc_id").cast("string"),
        lit(" &amp;\nfriends </TITLE>"))
      val desc = when(m4 === 3, lit(""))
        .when(m4 === 1, concat(lit("<meta content=\"Desc "),
          col("doc_id").cast("string"), lit(" here\" name=\"description\">")))
        .otherwise(concat(lit("<meta name=\"description\" content=\"Desc "),
          col("doc_id").cast("string"), lit(" here\">")))
      val canon = when(m5 === 4, lit(""))
        .when(m5 === 2, concat(lit("<link href=\"/c/"),
          col("doc_id").cast("string"), lit("\" rel=\"canonical\">")))
        .otherwise(concat(lit("<link rel=\"canonical\" href=\"../canon/"),
          pmod(col("doc_id"), lit(10L)).cast("string"), lit("\">")))
      val cs = when(m4 === 0, lit("<meta charset=\"UTF-8\">"))
        .when(m4 === 1, lit("<META CHARSET=utf-8>")).otherwise(lit(""))
      val html = concat(lit("<html><head>"), title, desc, canon, cs,
        lit("</head><body><p>"), substring(col("text"), 1, 40),
        lit("</p></body></html>"))
      TextAnalysis.pageMeta(
          t(s, dir, "documents").select(col("doc_id"), url.as("url"),
            html.as("html")))
        .orderBy("doc_id")
    }),
    // sitemap parsing: three <url> entries per domain with optional
    // lastmod/changefreq/priority fields absent in rotation and
    // whitespace-padded loc values — the oracle derives each row
    // arithmetically
    "q203_sitemap_parse" -> ((s, dir) => {
      val sm = t(s, dir, "documents")
        .select(pmod(col("doc_id"), lit(7L)).cast("string").as("__d")).distinct()
        .select(concat(lit("site"), col("__d"), lit(".example.com")).as("domain"),
          concat(
            lit("<?xml version=\"1.0\"?>\n<urlset>\n"),
            lit("<url><loc> https://site"), col("__d"),
            lit(".example.com/p1 </loc>"),
            lit("<lastmod>2026-01-0"), col("__d"), lit("</lastmod>"),
            lit("<changefreq>daily</changefreq>" +
              "<priority>0.8</priority></url>\n"),
            lit("<url><loc>https://site"), col("__d"),
            lit(".example.com/p2</loc><priority>0.5</priority></url>\n"),
            lit("<url><loc>https://site"), col("__d"),
            lit(".example.com/p3</loc><lastmod>2026-02-1"), col("__d"),
            lit("</lastmod></url>\n</urlset>")).as("xml"))
      TextAnalysis.sitemapParse(sm).orderBy("domain", "pos")
    }),
    // sitemap INDEX files (sitemapindex/sitemap/loc) for even
    // domains, plain urlsets for odd — the kind column routes index
    // rows back to the fetch frontier instead of losing them
    "q257_sitemap_index" -> ((s, dir) => {
      val d = col("__d")
      val idx = concat(
        lit("<?xml version=\"1.0\"?>\n<sitemapindex>\n" +
          "<sitemap><loc> https://site"), d,
        lit(".example.com/sitemap-a.xml </loc><lastmod>2026-03-0"), d,
        lit("</lastmod></sitemap>\n<sitemap><loc>https://cdn.maps.net/big"),
        d, lit(".xml</loc></sitemap>\n</sitemapindex>"))
      val urlset = concat(
        lit("<?xml version=\"1.0\"?>\n<urlset>\n<url><loc>https://site"), d,
        lit(".example.com/only</loc></url>\n</urlset>"))
      val sm = t(s, dir, "documents")
        .select(pmod(col("doc_id"), lit(7L)).cast("string").as("__d")).distinct()
        .select(concat(lit("site"), d, lit(".example.com")).as("domain"),
          when(pmod(d.cast("long"), lit(2L)) === 0, idx).otherwise(urlset)
            .as("xml"))
      TextAnalysis.sitemapParse(sm).orderBy("domain", "pos")
    }),
    // RFC 9309 longest-match resolution: Disallow:/ + Allow:/public/
    // must invert (admit the public tree), a longer Disallow must
    // beat a shorter Allow, and an exact-length tie must fall to
    // Allow — three robots shapes x five path classes
    "q201_robots_allow" -> ((s, dir) => {
      def robotsFor(d: Column) =
        when(d === "3", concat_ws("\n",
          lit("User-agent: *"), lit("Allow: /"), lit("Disallow: /tmp")))
        .when(d === "5", concat_ws("\n",
          lit("User-agent: *"), lit("Disallow: /dir/"),
          lit("Allow: /dir/"), lit("Disallow: /x")))
        .otherwise(concat_ws("\n",
          lit("User-agent: *"), lit("Disallow: /"),
          lit("Allow: /public/"), lit("Allow: /pub")))
      val robots = t(s, dir, "documents")
        .select(pmod(col("doc_id"), lit(7L)).cast("string").as("__d")).distinct()
        .select(concat(lit("site"), col("__d"), lit(".example.com")).as("domain"),
          robotsFor(col("__d")).as("robots"))
      val m5 = pmod(col("doc_id"), lit(5L))
      val url = concat(lit("https://site"),
        pmod(col("doc_id"), lit(7L)).cast("string"), lit(".example.com"),
        when(m5 === 0, "/public/page").when(m5 === 1, "/private/page")
          .when(m5 === 2, "/pub-file").when(m5 === 3, "/tmp-file")
          .otherwise("/dir/x"))
      TextAnalysis.robotsGate(
          t(s, dir, "documents").select(col("doc_id"), url.as("url")), robots)
        .orderBy("doc_id")
    }),
    // GIF/WebP/TIFF header parsing over a mixed synthesized lake: one
    // format per doc_id%7 (GIF 89a/87a, WebP VP8X/VP8/VP8L, TIFF
    // II/MM) — every parser variant exercised; the oracle predicts
    // dimensions from the builder formulas
    "q195_gif_webp_tiff" -> ((s, dir) => {
      val wv = (col("n_chars") % 640 + 1).cast("long")
      val hv = (col("n_chars") % 480 + 1).cast("long")
      def leHex(c: Column, nBytes: Int) = concat((0 until nBytes).map(i =>
        lpad(hex(shiftright(c, 8 * i).bitwiseAND(255L)), 2, "0")): _*)
      def beHex(c: Column, nBytes: Int) = concat((0 until nBytes).map(i =>
        lpad(hex(shiftright(c, 8 * (nBytes - 1 - i)).bitwiseAND(255L)), 2, "0")): _*)
      val m = pmod(col("doc_id"), lit(7L))
      val hexStr =
        when(m === 0, concat(lit("474946383961"), leHex(wv, 2), leHex(hv, 2), lit("F70000")))
        .when(m === 1, concat(lit("474946383761"), leHex(wv, 2), leHex(hv, 2), lit("000000")))
        .when(m === 2, concat(lit("524946462400000057454250"), lit("565038580A000000"),
          lit("00000000"), leHex(wv - 1, 3), leHex(hv - 1, 3)))
        .when(m === 3, concat(lit("524946462400000057454250"), lit("565038200A000000"),
          lit("000000"), lit("9D012A"), leHex(wv, 2), leHex(hv, 2)))
        .when(m === 4, concat(lit("524946462400000057454250"), lit("5650384C05000000"),
          lit("2F"), leHex((wv - 1) + ((hv - 1) * 16384L), 4)))
        .when(m === 5, concat(lit("49492A00"), leHex(lit(8L), 4),
          leHex(lit(2L), 2),
          leHex(lit(256L), 2), leHex(lit(3L), 2), leHex(lit(1L), 4), leHex(wv, 2), lit("0000"),
          leHex(lit(257L), 2), leHex(lit(4L), 2), leHex(lit(1L), 4), leHex(hv, 4),
          lit("00000000")))
        .otherwise(concat(lit("4D4D002A"), beHex(lit(8L), 4),
          beHex(lit(2L), 2),
          beHex(lit(256L), 2), beHex(lit(3L), 2), beHex(lit(1L), 4), beHex(wv, 2), lit("0000"),
          beHex(lit(257L), 2), beHex(lit(4L), 2), beHex(lit(1L), 4), beHex(hv, 4),
          lit("00000000")))
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), unhex(hexStr).as("payload"))
      val mm = Multimodal.containerMeta(media, Seq("gif", "webp", "tiff"))
      mm.select(col("media_id"),
          when(mm("gif").isNotNull, concat(lit("gif"), mm("gif.version")))
            .when(mm("webp").isNotNull, mm("webp.variant"))
            .when(mm("tiff").isNotNull,
              concat(lit("tiff_"), lower(mm("tiff.byte_order")))).as("format"),
          coalesce(mm("gif.width"), mm("webp.width"), mm("tiff.width")).as("width"),
          coalesce(mm("gif.height"), mm("webp.height"), mm("tiff.height")).as("height"))
        .orderBy("media_id")
    }),
    // MP4/ISO-BMFF box-walk round-trip: real ftyp + a VARIABLE-size
    // free box (so the walk must follow sizes, not fixed offsets) +
    // moov{mvhd,trak{tkhd}}, alternating version-0/version-1 field
    // layouts by doc parity — the oracle recomputes the builder
    // formulas arithmetically
    "q199_mp4_meta" -> ((s, dir) => {
      val tsv = (col("n_chars") % 9000 + 1000).cast("long")
      val dur = (col("n_chars") * 100 + pmod(col("doc_id"), lit(100L))).cast("long")
      val wv = (col("n_chars") % 640 + 1).cast("long")
      val hv = (col("n_chars") % 480 + 1).cast("long")
      val k = pmod(col("doc_id"), lit(5L))
      val v1 = pmod(col("doc_id"), lit(2L)) === 1
      def be(c: Column, n: Int) = lpad(hex(c), 2 * n, "0")
      val matrix = // unity transform, ISO 14496-12 §8.3.2 default
        "000100000000000000000000000000000001000000000000000000000000000040000000"
      val zeros80 = "0" * 160
      val mvhd = when(!v1,
          concat(lit("0000006C" + "6D766864" + "00000000" +
            "00000000" + "00000000"), be(tsv, 4), be(dur, 4), lit(zeros80)))
        .otherwise(
          concat(lit("00000078" + "6D766864" + "01000000" + "0" * 32),
            be(tsv, 4), lit("00000000"), be(dur, 4), lit(zeros80)))
      val tkhd = when(!v1,
          concat(lit("0000005C" + "746B6864" + "00000007" +
            "00000000" + "00000000" + "00000001" + "00000000"), be(dur, 4),
            lit("0" * 16 + "0" * 16 + matrix),
            be(wv, 2), lit("0000"), be(hv, 2), lit("0000")))
        .otherwise(
          concat(lit("00000068" + "746B6864" + "01000007" +
            "0" * 16 + "0" * 16 + "00000001" + "00000000" + "00000000"),
            be(dur, 4), lit("0" * 16 + "0" * 16 + matrix),
            be(wv, 2), lit("0000"), be(hv, 2), lit("0000")))
      val trak = concat(when(!v1, lit("00000064")).otherwise(lit("00000070")),
        lit("7472616B"), tkhd)
      val moov = concat(when(!v1, lit("000000D8")).otherwise(lit("000000F0")),
        lit("6D6F6F76"), mvhd, trak)
      val free = concat(be(k + 8, 4), lit("66726565"),
        lit("00000000").substr(lit(1), k * 2))
      val hexStr = concat(lit("00000010" + "66747970" + "69736F6D" + "00000200"),
        free, moov)
      // materialize the synthesized payloads: the box walk probes many
      // byte positions, and Catalyst would inline the whole builder
      // tree into every probe (the round-8 OOM pitfall)
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), unhex(hexStr).as("payload"))
        .localCheckpoint()
      Multimodal.containerMeta(media, Seq("mp4"))
        .select(col("media_id"), col("n_bytes"), col("mp4.brand").as("brand"),
          col("mp4.timescale").as("timescale"), col("mp4.duration").as("duration"),
          col("mp4.width").as("width"), col("mp4.height").as("height"))
        .orderBy("media_id")
    }),
    // main-content extraction: a link-dense nav (long enough to pass
    // minChars — only the link-ratio rule can drop it), the article
    // paragraph, a too-short block, and a link-heavy footer; the
    // oracle replays only the text-clean collapse on the kept block
    "q224_main_content" -> ((s, dir) => {
      val html = concat(
        lit("<div class=\"nav\"><a href=\"/\">Homepage link</a> " +
          "<a href=\"/a\">About our team</a> <a href=\"/c\">Contact form</a>" +
          "</div><p>"),
        substring(col("text"), 1, 60),
        lit("</p><p>Short.</p><div class=\"footer\">" +
          "<a href=\"/tos\">Terms of service</a> and " +
          "<a href=\"/priv\">the privacy policy</a></div>"))
      TextAnalysis.mainContent(
          t(s, dir, "documents").select(col("doc_id"), html.as("html")))
        .orderBy("doc_id")
    }),
    // code-corpus language id over six planted path/shebang shapes:
    // extension map, env-aware shebang override (incl. over .txt),
    // well-known filename, extensionless dotfile
    "q225_code_langid" -> ((s, dir) => {
      val m = pmod(col("doc_id"), lit(6L))
      val path = when(m === 0, "src/app.py").when(m === 1, "lib/util.scala")
        .when(m === 2, "tools/run").when(m === 3, "Makefile")
        .when(m === 4, ".gitignore").otherwise("notes.txt")
      val text = when(m === 2, "#!/usr/bin/env python3\nprint(1)\n")
        .when(m === 5, "#!/bin/bash\necho\n").otherwise("x = 1\n")
      CodeCorpus.codeLangId(
          t(s, dir, "documents").select(col("doc_id"), path.as("path"),
            text.as("text")), idCol = "doc_id")
        .orderBy("doc_id")
    }),
    // license detection: SPDX tag, the MIT/GPL phrase fingerprints,
    // SPDX-beats-phrase precedence, and a no-license tail slice
    "q226_license_scan" -> ((s, dir) => {
      val m = pmod(col("doc_id"), lit(5L))
      val text = when(m === 0, concat(
          lit("// SPDX-License-Identifier: Apache-2.0\n"),
          substring(col("text"), 1, 40)))
        .when(m === 1, lit("Permission is hereby granted, free of " +
          "charge, to any person\n"))
        .when(m === 2, lit("licensed under the GNU General Public " +
          "License v3\n"))
        .when(m === 3, lit("# SPDX-License-Identifier: MIT\n" +
          "GNU General Public License\n"))
        .otherwise(substring(col("text"), 1, 50))
      CodeCorpus.licenseScan(
          t(s, dir, "documents").select(col("doc_id"), text.as("text")),
          idCol = "doc_id")
        .orderBy("doc_id")
    }),
    // code quality stats over a three-line fixture with per-lang
    // comment prefixes and a doc_id-sized long third line — every
    // count is exact integer arithmetic
    "q227_code_stats" -> ((s, dir) => {
      val m = pmod(col("doc_id"), lit(4L))
      val lang = when(m === 0, "python").when(m === 1, "scala")
        .when(m === 2, "sql").otherwise("text")
      val line1 = when(m === 0, "# do not edit").when(m === 1, "// header")
        .when(m === 2, "-- header").otherwise("plain header")
      val text = concat(line1, lit("\nval x = 1;\n"),
        call_function("repeat", lit("ab"),
          (lit(40) + pmod(col("doc_id"), lit(30L))).cast("int")))
      CodeCorpus.codeStats(
          t(s, dir, "documents").select(col("doc_id"), text.as("text"),
            lang.as("lang")), idCol = "doc_id")
        .orderBy("doc_id")
    }),
    // notebook cell extraction: two nbformat cells per doc, JSON
    // malformed on doc_id%11==0 (fails closed to zero rows)
    "q228_notebook_cells" -> ((s, dir) => {
      val good = concat(
        lit("{\"cells\":[{\"cell_type\":\"markdown\",\"source\":[\"# T"),
        col("doc_id").cast("string"),
        lit("\"]},{\"cell_type\":\"code\",\"source\":[\"x=1\\n\",\"y="),
        pmod(col("doc_id"), lit(9L)).cast("string"),
        lit("\\n\"]}],\"nbformat\":4}"))
      val json = when(pmod(col("doc_id"), lit(11L)) === 0, "{nope")
        .otherwise(good)
      CodeCorpus.notebookCells(
          t(s, dir, "documents").select(col("doc_id"), json.as("json")),
          idCol = "doc_id")
        .orderBy("doc_id", "cell_idx")
    }),
    // chat validation over four planted conversation shapes: valid
    // with system head, dangling user, broken alternation, blank
    // content — each flag trips on exactly one shape
    "q229_chat_validate" -> ((s, dir) => {
      def msg(role: String, content: Column) =
        struct(lit(role).as("role"), content.as("content"))
      val idStr = col("doc_id").cast("string")
      val m = pmod(col("doc_id"), lit(4L))
      val msgs = when(m === 0, array(msg("system", lit("S")),
          msg("user", concat(lit("Q"), idStr)), msg("assistant", lit("A1")),
          msg("user", lit("F")), msg("assistant", lit("A2"))))
        .when(m === 1, array(msg("user", concat(lit("Q"), idStr)),
          msg("assistant", lit("A1")), msg("user", lit("F"))))
        .when(m === 2, array(msg("user", lit("Q")), msg("user", lit("R")),
          msg("assistant", concat(lit("A"), idStr))))
        .otherwise(array(msg("user", lit(" ")), msg("assistant", lit("A"))))
      ChatData.chatValidate(
          t(s, dir, "documents").select(col("doc_id"), msgs.as("msgs")),
          idCol = "doc_id")
        .orderBy("doc_id")
    }),
    // chat rendering: two-message conversation to the role-token
    // template, rendered string fully arithmetic
    "q230_chat_render" -> ((s, dir) => {
      def msg(role: String, content: Column) =
        struct(lit(role).as("role"), content.as("content"))
      val msgs = array(
        msg("user", concat(lit("Q"), col("doc_id").cast("string"))),
        msg("assistant", concat(lit("A"),
          pmod(col("doc_id"), lit(5L)).cast("string"))))
      ChatData.chatRender(
          t(s, dir, "documents").select(col("doc_id"), msgs.as("msgs")),
          idCol = "doc_id")
        .orderBy("doc_id")
    }),
    // fill-in-the-middle split over a doc_id-sized text slice; the
    // oracle replays the exact floor pivots and PSM assembly
    "q231_fim_split" -> ((s, dir) => {
      val slice = col("text").substr(lit(1),
        (lit(40) + pmod(col("doc_id"), lit(20L))).cast("int"))
      CodeCorpus.fimSplit(
          t(s, dir, "documents").select(col("doc_id"), slice.as("text")))
        .orderBy("doc_id")
    }),
    // repository packing: 7 arithmetic repos, unique paths, a tight
    // char budget so the path-order prefix rule is exercised; the
    // oracle replays the monotone cumulative-sum prefix
    "q232_repo_pack" -> ((s, dir) => {
      val repo = concat(lit("repo"), pmod(col("doc_id"), lit(7L)).cast("string"))
      val path = concat(lit("src/"), col("doc_id").cast("string"), lit(".py"))
      val text = call_function("repeat", lit("x"),
        (lit(5) + pmod(col("doc_id"), lit(4L))).cast("int"))
      CodeCorpus.repoPack(
          t(s, dir, "documents").select(repo.as("repo"), path.as("path"),
            text.as("text")), maxChars = 400L)
        .orderBy("repo")
    }),
    // unified-diff stats: one always-present file plus a second on
    // even docs, +/- line counts sized by doc_id arithmetic
    "q233_diff_stats" -> ((s, dir) => {
      val k = pmod(col("doc_id"), lit(4L))
      val d2 = when(pmod(col("doc_id"), lit(2L)) === 0,
        lit("diff --git a/y b/y\n--- a/y\n+++ b/y\n@@ -5 +5 @@\n-old\n+new\n"))
        .otherwise(lit(""))
      val text = concat(
        lit("diff --git a/f b/f\n--- a/f\n+++ b/f\n@@ -1 +1 @@\n"),
        call_function("repeat", lit("+a\n"), (k + 1).cast("int")),
        call_function("repeat", lit("-d\n"),
          pmod(col("doc_id"), lit(3L)).cast("int")),
        lit(" ctx\n"), d2)
      CodeCorpus.diffStats(
          t(s, dir, "documents").select(col("doc_id"), text.as("text")),
          idCol = "doc_id")
        .orderBy("doc_id")
    }),
    // PDF token census: k page objects + one /Type /Pages tree node
    // (pinning the [^s] guard), /Encrypt on %7, trailer on even docs
    "q234_pdf_meta" -> ((s, dir) => {
      val k = pmod(col("doc_id"), lit(5L)) + 1L
      val ver = concat(lit("1."),
        (pmod(col("doc_id"), lit(4L)) + 4L).cast("string"))
      val pdf = concat(lit("%PDF-"), ver,
        lit("\n1 0 obj\n<</Type /Pages>>\nendobj\n"),
        call_function("repeat", lit("2 0 obj\n<</Type /Page>>\nendobj\n"),
          k.cast("int")),
        when(pmod(col("doc_id"), lit(7L)) === 0,
          lit("trailer <</Encrypt 2 0 R>>\n")).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(2L)) === 0, lit("%%EOF"))
          .otherwise(lit("")))
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          encode(pdf, "UTF-8").as("payload"))
      Multimodal.containerMeta(media, Seq("pdf"))
        .select(col("media_id"), col("pdf.version").as("version"),
          col("pdf.n_objs").as("n_objs"), col("pdf.n_pages").as("n_pages"),
          col("pdf.encrypted").as("encrypted"),
          col("pdf.has_eof").as("has_eof"))
        .orderBy("media_id")
    }),
    // ZIP walk over stored entries (docx/xlsx/epub/plain shapes), a
    // central-directory terminator, doc_id-sized member data
    "q235_zip_meta" -> ((s, dir) => {
      def ascHex(str: String) =
        str.getBytes("ISO-8859-1").map("%02X".format(_)).mkString
      def leH(c: Column, n: Int) = concat((0 until n).map(i =>
        lpad(hex(shiftright(c, 8 * i).bitwiseAND(255L)), 2, "0")): _*)
      val k = pmod(col("doc_id"), lit(3L)) + 1L
      def entry(name: String) = concat(
        lit("504B0304" + "0A00" + "0000" + "0000" + "00000000" + "00000000"),
        leH(k, 4), leH(k, 4),
        lit("%02X00".format(name.length) + "0000" + ascHex(name)),
        call_function("repeat", lit("44"), k.cast("int")))
      val m = pmod(col("doc_id"), lit(4L))
      val hexStr = concat(
        when(m === 0, entry("word/document.xml"))
          .when(m === 1, entry("xl/workbook.xml"))
          .when(m === 2, concat(entry("mimetype"),
            entry("META-INF/container.xml")))
          .otherwise(entry("a.txt")),
        lit("504B0102"))
      // materialize: the header walk probes many byte positions (the
      // round-8 OOM pitfall)
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), unhex(hexStr).as("payload"))
        .localCheckpoint()
      Multimodal.containerMeta(media, Seq("zip"))
        .select(col("media_id"), col("zip.n_entries").as("n_entries"),
          col("zip.complete").as("complete"),
          col("zip.first_name").as("first_name"),
          col("zip.total_usize").as("total_usize"),
          col("zip.kind").as("kind"))
        .orderBy("media_id")
    }),
    // gzip member header: FNAME on even docs, FTEXT on %3, mtime =
    // doc_id, trailing junk standing in for the deflate stream
    "q236_gzip_meta" -> ((s, dir) => {
      def leH(c: Column, n: Int) = concat((0 until n).map(i =>
        lpad(hex(shiftright(c, 8 * i).bitwiseAND(255L)), 2, "0")): _*)
      val hasName = pmod(col("doc_id"), lit(2L)) === 0
      val isText = pmod(col("doc_id"), lit(3L)) === 0
      val flg = when(hasName, lit(8L)).otherwise(lit(0L)) +
        when(isText, lit(1L)).otherwise(lit(0L))
      val fnameHex = when(hasName, concat(
        hex(concat(lit("f"), pmod(col("doc_id"), lit(9L)).cast("string"),
          lit(".txt"))), lit("00"))).otherwise(lit(""))
      val hexStr = concat(lit("1F8B" + "08"), lpad(hex(flg), 2, "0"),
        leH(col("doc_id"), 4), lit("00"),
        lpad(hex(pmod(col("doc_id"), lit(13L))), 2, "0"),
        fnameHex, lit("ABCD"))
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), unhex(hexStr).as("payload"))
      Multimodal.containerMeta(media, Seq("gzip"))
        .select(col("media_id"), col("gzip.method").as("method"),
          col("gzip.mtime").as("mtime"), col("gzip.os").as("os"),
          col("gzip.is_text").as("is_text"), col("gzip.fname").as("fname"))
        .orderBy("media_id")
    }),
    // preference-pair validation: four planted shapes — valid with
    // chosen longer, identical pair, blank rejected, valid with
    // rejected longer; lengths are fixture constants
    "q237_pref_validate" -> ((s, dir) => {
      val m = pmod(col("doc_id"), lit(4L))
      val prompt = concat(lit("P"), col("doc_id").cast("string"))
      val chosen = when(m === 0, substring(col("text"), 1, 30))
        .when(m === 1, substring(col("text"), 1, 25))
        .when(m === 2, substring(col("text"), 1, 10))
        .otherwise(substring(col("text"), 1, 15))
      val rejected = when(m === 0, substring(col("text"), 1, 20))
        .when(m === 1, substring(col("text"), 1, 25))
        .when(m === 2, lit("  "))
        .otherwise(substring(col("text"), 1, 40))
      PrefData.prefValidate(
          t(s, dir, "documents").select(col("doc_id").as("pair_id"),
            prompt.as("prompt"), chosen.as("chosen"),
            rejected.as("rejected")))
        .orderBy("pair_id")
    }),
    // arena win rates over an arithmetic comparison table (three
    // models in a rotating a/b pairing, %5-bucketed outcomes); the
    // oracle replays the same aggregation in SQL
    // Bradley-Terry arena strengths next to the q238 win rate: a
    // 4-model comparison cycle with skewed outcomes plus a
    // never-winning model z (excluded from the fit, null strength);
    // 10 MM rounds on the engine-exact 9-dp grid
    "q334_bradley_terry" -> ((s, dir) => {
      val r = pmod(col("doc_id"), lit(4L))
      val isZ = pmod(col("doc_id"), lit(11L)) === 0
      val comps = t(s, dir, "documents").select(
        concat(lit("m"), r.cast("string")).as("model_a"),
        when(isZ, lit("z")).otherwise(
          concat(lit("m"), pmod(r + 1L, lit(4L)).cast("string")))
          .as("model_b"),
        when(isZ, lit("a"))
          .otherwise(when(pmod(col("doc_id"), lit(7L)) < 3, "a")
            .when(pmod(col("doc_id"), lit(7L)) < 6, "b")
            .otherwise("tie")).as("winner"))
      PrefData.bradleyTerry(comps, numIters = 10).orderBy("model")
    }),
    "q238_win_rate" -> ((s, dir) => {
      val r = pmod(col("doc_id"), lit(3L))
      val comps = t(s, dir, "documents").select(
        concat(lit("m"), r.cast("string")).as("model_a"),
        concat(lit("m"), pmod(r + 1L, lit(3L)).cast("string")).as("model_b"),
        when(pmod(col("doc_id"), lit(5L)) < 2, "a")
          .when(pmod(col("doc_id"), lit(5L)) < 4, "b")
          .otherwise("tie").as("winner"))
      PrefData.winRate(comps).orderBy("model")
    }),
    // Fleiss' kappa over a 3-rater table: two raters always agree,
    // the third only on even items — exact integer moments, kappa
    // one double expression at the end
    "q239_fleiss_kappa" -> ((s, dir) => {
      val ratings = t(s, dir, "documents")
        .select(col("doc_id"), explode(sequence(lit(0), lit(2))).as("j"))
        .select(col("doc_id").as("item_id"),
          concat(lit("a"), col("j").cast("string")).as("annotator"),
          concat(lit("L"), when(col("j") < 2,
              pmod(col("doc_id"), lit(3L)))
            .otherwise(when(pmod(col("doc_id"), lit(2L)) === 0,
              pmod(col("doc_id"), lit(3L)))
              .otherwise(pmod(col("doc_id") + 1L, lit(3L))))
            .cast("string")).as("label"))
      PrefData.fleissKappa(ratings)
    }),
    // table-to-markdown over the q220 table shapes: header separator
    // after the th row, the solo table renders bare
    "q240_table_markdown" -> ((s, dir) => {
      val html = concat(
        lit("<p>"), substring(col("text"), 1, 20), lit("</p>" +
          "<TABLE class=\"data\"><tr><th>Name</th><th>Value</th></tr>" +
          "<tr><td>alpha &amp; co</td><td>"),
        col("doc_id").cast("string"), lit("</td></tr></TABLE>"),
        when(pmod(col("doc_id"), lit(4L)) === 0,
          concat(lit("<table><tr><td> solo "),
            pmod(col("doc_id"), lit(9L)).cast("string"),
            lit(" </td></tr></table>"))).otherwise(lit("")))
      TextAnalysis.tableToMarkdown(TextAnalysis.htmlTables(
          t(s, dir, "documents").select(col("doc_id"), html.as("html"))))
        .orderBy("doc_id", "table_idx")
    }),
    // RAG chunking over the real document text (size 50, overlap
    // 10); the oracle replays the ceil arithmetic with
    // generate_series
    "q241_chunk_text" -> ((s, dir) => {
      TextAnalysis.chunkText(t(s, dir, "documents"), size = 50,
          overlap = 10)
        .orderBy("doc_id", "chunk_idx")
    }),
    // SQuAD-style EM/F1 on four planted shapes: article + punct
    // normalization, multiset-overlap F1, best-of-refs
    "q242_eval_scores" -> ((s, dir) => {
      val m = pmod(col("doc_id"), lit(4L))
      val pred = when(m === 0, "The answer is 42").when(m === 1, "Paris.")
        .when(m === 2, "alpha beta").otherwise("x x y")
      val refs = when(m === 0, array(lit("answer 42"), lit("nope")))
        .when(m === 1, array(lit("the paris")))
        .when(m === 2, array(lit("gamma delta")))
        .otherwise(array(lit("x x"), lit("x z z")))
      Eval.evalScores(
          t(s, dir, "documents").select(col("doc_id").as("pred_id"),
            pred.as("pred"), refs.as("refs")))
        .orderBy("pred_id")
    }),
    // robots meta directives: both attribute orders, token match,
    // tagless and "all" pages fully indexable
    "q243_robots_meta" -> ((s, dir) => {
      val m = pmod(col("doc_id"), lit(4L))
      val html = concat(lit("<html><head>"),
        when(m === 0, lit("<meta name=\"robots\" " +
          "content=\"noindex, nofollow\">"))
          .when(m === 1, lit("<meta content=\"NOARCHIVE\" " +
            "name=\"robots\">"))
          .when(m === 2, lit(""))
          .otherwise(lit("<meta name=\"robots\" content=\"all\">")),
        lit("</head><body>"), substring(col("text"), 1, 30),
        lit("</body></html>"))
      TextAnalysis.robotsMeta(
          t(s, dir, "documents").select(col("doc_id"), html.as("html")))
        .orderBy("doc_id")
    }),
    // int8 scalar quantization over arithmetic 8-dim vectors
    // (range 21 per vector): floor codes are tie-free and
    // engine-identical
    "q244_sq8_quantize" -> ((s, dir) => {
      val vec = transform(sequence(lit(0), lit(7)), i =>
        (pmod(col("doc_id"), lit(5L)) + i * 3L).cast("double"))
      val out = Similarity.sq8Quantize(
        t(s, dir, "documents").select(col("doc_id").as("emb_id"),
          vec.as("vec")))
      out.select(col("emb_id"),
          concat_ws(",", col("codes")).as("codes_str"),
          col("q_min"), col("q_max"), col("max_abs_err"))
        .orderBy("emb_id")
    }),
    // margin-based bitext mining over planted direction vectors:
    // per-direction pure targets (cos 1) beat the mixed distractors
    // (cos <= 0.8); decisions hashed, margins internal
    "q245_bitext_mine" -> ((s, dir) => {
      import s.implicits._
      val d4 = pmod(col("doc_id"), lit(4L)).cast("int")
      val scale = (pmod(col("doc_id"), lit(3L)) + 1L).cast("double")
      val src = t(s, dir, "documents").select(col("doc_id").as("src_id"),
        transform(sequence(lit(0), lit(3)), i =>
          when(i === d4, scale).otherwise(lit(0.0))).as("embedding"))
      val tgt = (0 until 4).flatMap { d =>
        def vec(f: Int => Double) = (0 until 4).map(f)
        Seq((d.toLong, vec(i => if (i == d) 1.0 else 0.0)),
          (4L + d, vec(i => if (i == d) 0.6
            else if (i == (d + 1) % 4) 0.8 else 0.0)))
      }.toDF("tgt_id", "embedding")
      Similarity.bitextMine(src, tgt, planes = 3, dim = 4, k = 4,
          threshold = 1.02)
        .orderBy("src_id")
    }),
    // magic-byte sniffing over ten planted payload families — the
    // dispatcher decision per doc, ftyp split by brand, RIFF by form
    "q246_sniff_format" -> ((s, dir) => {
      val m = pmod(col("doc_id"), lit(10L))
      val hexStr = when(m === 0, "89504E470D0A1A0A")
        .when(m === 1, "FFD8FFE000104A46")
        .when(m === 2, "474946383961AAAA")
        .when(m === 3, "52494646240000005741564520")
        .when(m === 4, "0000001C667479706176696631") // ftyp avif1->heif? brand 'avif'
        .when(m === 5, "000000186674797069736F6D")   // ftyp isom -> mp4
        .when(m === 6, "255044462D312E37")
        .when(m === 7, "1F8B0800")
        .when(m === 8, "504152310000")
        .otherwise(hex(concat(lit("the plain text head "),
          substring(col("text"), 1, 8))))
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), unhex(hexStr).as("payload"))
      media.select(col("media_id"),
          Multimodal.sniffFormat(col("payload")).as("format"))
        .orderBy("media_id")
    }),
    // SVG root metadata: width/height with unit suffixes, a
    // viewBox-only document, a non-SVG page
    "q247_svg_meta" -> ((s, dir) => {
      val m = pmod(col("doc_id"), lit(3L))
      val wv = (col("n_chars") % 640 + 1).cast("string")
      val hv = (col("n_chars") % 480 + 1).cast("string")
      val text = when(m === 0, concat(lit("<svg width=\""), wv,
          lit("px\" height=\""), hv, lit("\"><rect/></svg>")))
        .when(m === 1, concat(lit("<?xml version=\"1.0\"?><svg viewBox=\"0 0 "),
          wv, lit(" "), hv, lit("\"></svg>")))
        .otherwise(concat(lit("<html>"), substring(col("text"), 1, 20),
          lit("</html>")))
      val mm = t(s, dir, "documents")
        .select(col("doc_id"), Multimodal.svgMeta(text).as("svg"))
      mm.select(col("doc_id"), col("svg.width").as("width"),
          col("svg.height").as("height"),
          col("svg.view_box.vb_width").as("vb_width"),
          col("svg.view_box.vb_height").as("vb_height"))
        .orderBy("doc_id")
    }),
    // invisible-char census: doc_id-sized zero-width run, a bidi
    // control on %3, a Cyrillic-а spoof word on even docs
    "q248_invisible_chars" -> ((s, dir) => {
      val k = pmod(col("doc_id"), lit(4L))
      val text = concat(
        call_function("repeat", lit("\u200B"), k.cast("int")),
        lit("plain "),
        when(pmod(col("doc_id"), lit(2L)) === 0, lit("p\u0430ypal "))
          .otherwise(lit("paypal ")),
        when(pmod(col("doc_id"), lit(3L)) === 0, lit("\u202Ehidden"))
          .otherwise(lit("tail")))
      TextAnalysis.invisibleChars(
          t(s, dir, "documents").select(col("doc_id"), text.as("text")))
        .orderBy("doc_id")
    }),
    // homoglyph dedup keys: the spoofed brand collapses onto ASCII,
    // Cyrillic caps in the table map both cases, clean text unchanged
    "q249_homoglyph" -> ((s, dir) => {
      val m = pmod(col("doc_id"), lit(3L))
      val text = when(m === 0, lit("pаypаl login"))
        .when(m === 1, lit("ВАТ МЕН"))
        .otherwise(lit("clean text"))
      TextAnalysis.homoglyphNormalize(
          t(s, dir, "documents").select(col("doc_id"), text.as("text")))
        .orderBy("doc_id")
    }),
    // CSV dialect sniffing over four planted shapes: comma+header,
    // semicolon numeric (no header), tab, and plain prose (nothing
    // consistent)
    "q250_csv_sniff" -> ((s, dir) => {
      val m = pmod(col("doc_id"), lit(4L))
      val idf = (pmod(col("doc_id"), lit(90L)) + 1L).cast("string")
      val text = when(m === 0, concat(lit("name,age,city\nann,"), idf,
          lit(",berlin\nbob,41,rome")))
        .when(m === 1, concat(lit("1;2;"), idf, lit("\n4;5;6")))
        .when(m === 2, lit("a\tb\nc\td"))
        .otherwise(lit("plain text line\nanother line here"))
      TextAnalysis.csvSniff(
          t(s, dir, "documents").select(col("doc_id"), text.as("text")))
        .orderBy("doc_id")
    }),
    // CSV typed column census under the SNIFFED dialect (the full
    // sniff -> census loop): semicolon files every third doc,
    // headerless files every fourth — int/double/date/bool columns
    // with planted empties, classified per column
    "q259_csv_type_census" -> ((s, dir) => {
      val delim = when(pmod(col("doc_id"), lit(3L)) === 0, lit(";"))
        .otherwise(lit(","))
      val h = concat(lit("id"), delim, lit("amount"), delim, lit("when"),
        delim, lit("ok"))
      val l1 = concat(col("doc_id").cast("string"), delim, lit("3.5"),
        delim, lit("2026-01-02"), delim, lit("true"))
      val l2 = concat(lit("7"), delim, lit("4"), delim,
        lit("2026-02-03"), delim, lit("false"))
      val l3 = concat(delim, lit("5.5"), delim, delim, lit("TRUE"))
      val text = when(pmod(col("doc_id"), lit(4L)) === 1,
        concat_ws("\n", l1, l2, l3))
        .otherwise(concat_ws("\n", h, l1, l2, l3))
      val files = t(s, dir, "documents").select(col("doc_id"), text.as("text"))
      val sniffed = TextAnalysis.csvSniff(files)
        .select(col("doc_id"), col("delimiter"), col("has_header"))
      TextAnalysis.csvTypeCensus(files.join(sniffed, Seq("doc_id")))
        .orderBy("doc_id", "col_idx")
    }),
    // the census collapsed to one Spark-DDL schema string per file —
    // the artifact the ingestion loop exists to produce
    "q260_csv_schema" -> ((s, dir) => {
      val delim = when(pmod(col("doc_id"), lit(3L)) === 0, lit(";"))
        .otherwise(lit(","))
      val h = concat(lit("id"), delim, lit("amount"), delim, lit("when"),
        delim, lit("ok"))
      val l1 = concat(col("doc_id").cast("string"), delim, lit("3.5"),
        delim, lit("2026-01-02"), delim, lit("true"))
      val l2 = concat(lit("7"), delim, lit("4"), delim,
        lit("2026-02-03"), delim, lit("false"))
      val l3 = concat(delim, lit("5.5"), delim, delim, lit("TRUE"))
      val text = when(pmod(col("doc_id"), lit(4L)) === 1,
        concat_ws("\n", l1, l2, l3))
        .otherwise(concat_ws("\n", h, l1, l2, l3))
      val files = t(s, dir, "documents").select(col("doc_id"), text.as("text"))
      val sniffed = TextAnalysis.csvSniff(files)
        .select(col("doc_id"), col("delimiter"), col("has_header"))
      TextAnalysis.csvInferSchema(
          TextAnalysis.csvTypeCensus(files.join(sniffed, Seq("doc_id"))))
        .orderBy("doc_id")
    }),
    // JSON key census: two always-keys, a third on even docs, the
    // %11 docs malformed and contributing nothing
    "q251_json_keys" -> ((s, dir) => {
      val json = when(pmod(col("doc_id"), lit(11L)) === 0, "{oops")
        .otherwise(concat(lit("{\"a\":1,\"b\":\"x\""),
          when(pmod(col("doc_id"), lit(2L)) === 0, lit(",\"c\":[1]"))
            .otherwise(lit("")),
          lit("}")))
      TextAnalysis.jsonKeyCensus(
          t(s, dir, "documents").select(json.as("json")))
        .orderBy("key")
    }),
    // nested JSON path census at depth 2: dotted paths with per-path
    // type counts; meta.deep stays 'object' (children past the
    // bound), meta.deep.x is absent, the %11 docs malformed
    "q258_json_paths" -> ((s, dir) => {
      val json = when(pmod(col("doc_id"), lit(11L)) === 0, lit("{oops"))
        .when(pmod(col("doc_id"), lit(2L)) === 0,
          lit("{\"a\":1,\"meta\":{\"lang\":\"en\",\"tags\":[1,2]," +
            "\"deep\":{\"x\":true}},\"b\":null}"))
        .otherwise(lit("{\"a\":\"s\",\"flag\":false," +
          "\"meta\":{\"lang\":null}}"))
      TextAnalysis.jsonPathCensus(
          t(s, dir, "documents").select(json.as("json")), maxDepth = 2)
        .orderBy("path")
    }),
    // web-to-RAG composition: mainContent boilerplate removal feeds
    // chunkText — the two operators end to end on the q224 page
    // shape; the oracle replays clean-then-window over the same slice
    "q252_rag_pipeline" -> ((s, dir) => {
      val html = concat(
        lit("<div class=\"nav\"><a href=\"/\">Homepage link</a> " +
          "<a href=\"/a\">About our team</a> <a href=\"/c\">Contact form</a>" +
          "</div><p>"),
        substring(col("text"), 1, 60),
        lit("</p><div class=\"footer\">" +
          "<a href=\"/tos\">Terms of service</a> and " +
          "<a href=\"/priv\">the privacy policy</a></div>"))
      val content = TextAnalysis.mainContent(
        t(s, dir, "documents").select(col("doc_id"), html.as("html")))
      TextAnalysis.chunkText(
          content.select(col("doc_id"), col("content").as("text")),
          size = 25, overlap = 5)
        .orderBy("doc_id", "chunk_idx")
    }),
    // code-corpus composition: language id routes comment prefixes
    // into codeStats, the license gate keeps permissive files, and
    // fimSplit renders the survivors — four operators end to end
    "q253_code_pipeline" -> ((s, dir) => {
      val m = pmod(col("doc_id"), lit(3L))
      val path = when(m === 0, "src/app.py").when(m === 1, "lib/u.scala")
        .otherwise("doc.txt")
      val body = when(m === 0,
          lit("# SPDX-License-Identifier: MIT\nx = 1\n"))
        .when(m === 1,
          lit("// SPDX-License-Identifier: GPL-3.0\nval y = 2\n"))
        .otherwise(lit("plain notes\n"))
      val text = concat(body, substring(col("text"), 1, 20))
      val files = t(s, dir, "documents").select(col("doc_id").as("file_id"),
        path.as("path"), text.as("text"))
      val lang = CodeCorpus.codeLangId(files)
      val lic = CodeCorpus.licenseScan(files)
      val stats = CodeCorpus.codeStats(
        files.join(lang.select("file_id", "lang"), "file_id"))
      val kept = files.join(lic, "file_id")
        .filter(col("category") === "permissive")
        .join(stats.select("file_id", "n_comment_lines"), "file_id")
      CodeCorpus.fimSplit(kept.select(col("file_id"),
            col("text"), col("n_comment_lines")),
          idCol = "file_id")
        .join(kept.select("file_id", "n_comment_lines"), "file_id")
        .select(col("file_id"), col("n_comment_lines"), col("n_prefix"),
          col("n_middle"), col("n_suffix"))
        .orderBy("file_id")
    }),
    // quote-aware CSV parsing: an embedded-comma field and a ""
    // escape per row — the regex-inexpressible RFC 4180 cases
    "q254_csv_parse" -> ((s, dir) => {
      val text = concat(lit("id,name,notes\n"),
        col("doc_id").cast("string"),
        lit(",\"Smith, John\",\"said \"\"hi\"\"\""))
      TextAnalysis.csvParse(
          t(s, dir, "documents").select(col("doc_id"), text.as("text")),
          delimiter = ",")
        .orderBy("doc_id", "line_idx", "col_idx")
    }),
    // gzip-wrapped WARC records (the Common Crawl shape): each record
    // is a stored-deflate-block RFC 1952 member built from hex
    // expressions (CRC32 via the engine's crc32), one in five with a
    // corrupt magic — those must fail closed to an all-null parse row
    "q255_warc_gzip" -> ((s, dir) => {
      def leHex(c: Column, nBytes: Int) = concat((0 until nBytes).map(i =>
        lpad(hex(shiftright(c, 8 * i).bitwiseAND(255L)), 2, "0")): _*)
      val uri = concat(lit("https://site"),
        pmod(col("doc_id"), lit(7L)).cast("string"),
        lit(".example.com/p"), col("doc_id").cast("string"))
      val warc = concat(
        lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "), uri,
        lit("\r\nWARC-Date: 2026-01-01T00:00:00Z\r\nContent-Length: "),
        col("n_chars").cast("string"),
        lit("\r\n\r\nHTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>"),
        substring(col("text"), 1, 40), lit("</html>"))
      val wb = warc.cast("binary")
      val len = length(wb).cast("long")
      val magic = when(pmod(col("doc_id"), lit(5L)) === 0,
        lit("DEAD08000000000000FF")) // corrupt member: wrong magic
        .otherwise(lit("1F8B08000000000000FF"))
      // 10-byte header + one stored deflate block (01, LEN, ~LEN) +
      // payload + CRC32/ISIZE trailer — a fully valid member with no
      // compressor needed engine-side
      val gz = concat(unhex(magic), unhex(concat(lit("01"),
          leHex(len, 2), leHex(lit(65535L) - len, 2))),
        wb, unhex(concat(leHex(crc32(wb), 4), leHex(len, 4))))
      // checkpoint the synthesized binary: the builder tree must not
      // be re-inlined into the parser's probes (fixture-payload rule)
      val fixture = t(s, dir, "documents")
        .select(col("doc_id"), gz.as("warc_gz")).localCheckpoint()
      TextAnalysis.warcParseGzip(fixture).orderBy("doc_id")
    }),
    // code-corpus onboarding end to end: .tar.gz -> gunzip -> every
    // regular file's text -> language id (the prepare-code front end)
    "q276_targz_code" -> ((s, dir) => {
      val files = Multimodal.tarFileTexts(
        tarFixture(s, dir, gz = true).select(col("doc_id"),
          graft.functions.GunzipPayload(col("payload"), 1 << 26)
            .as("payload")))
      CodeCorpus.codeLangId(files, idCol = "doc_id", pathCol = "name")
        .orderBy("doc_id", "path")
    }),
    // zip entry listing, CD-primary: doc_id%3==0 is a REAL streaming-
    // writer archive (data-descriptor locals with zeroed sizes; the
    // central directory + EOCD carry the exact ones), %3==1 is a
    // CD-less local-header archive (fallback walk), %3==2 corrupts
    // the CD signature and the whole archive must vanish
    "q277_zip_list" -> ((s, dir) => {
      def leHex(c: Column, nBytes: Int) = concat((0 until nBytes).map(i =>
        lpad(hex(shiftright(c, 8 * i).bitwiseAND(255L)), 2, "0")): _*)
      val k = pmod(col("doc_id"), lit(4L)) + 1L
      val dataHex = call_function("repeat", lit("44"), k.cast("int"))
      val ddArchive = ddZipHex(k)
      // corrupt-CD variant: every CD entry signature broken (the
      // local headers and EOCD keep their own magics)
      val badArchive = regexp_replace(ddArchive, "504B0102", "424B0102")
      // CD-less archive: solo.txt with sizes in the local header
      val soloArchive = concat(
        lit("504B03041400" + "0000" + "0000" + "00000000" + "00000000"),
        leHex(k, 4), leHex(k, 4),
        lit("0800" + "0000" + "736F6C6F2E747874"), dataHex)
      val m = pmod(col("doc_id"), lit(3L))
      val hexStr = when(m === 0, ddArchive).when(m === 1, soloArchive)
        .otherwise(badArchive)
      val fixture = t(s, dir, "documents")
        .select(col("doc_id"), unhex(hexStr).as("payload"))
        .localCheckpoint()
      Multimodal.zipList(fixture).orderBy("doc_id", "entry_idx")
    }),
    // every member's text from a zip: even docs a CD-less stored
    // archive (directory entry filtered out), odd docs the streaming
    // data-descriptor archive resolved through its central directory
    "q285_zip_texts" -> ((s, dir) => {
      def leHex(c: Column, nBytes: Int) = concat((0 until nBytes).map(i =>
        lpad(hex(shiftright(c, 8 * i).bitwiseAND(255L)), 2, "0")): _*)
      def member(name: String, body: Column) = {
        val bb = body.cast("binary")
        val bl = length(bb).cast("long")
        concat(unhex(concat(lit("504B0304140000000000" + "00000000"),
          leHex(crc32(bb), 4), leHex(bl, 4), leHex(bl, 4),
          lit("%02X000000".format(name.length)))),
          lit(name).cast("binary"), bb)
      }
      val id = col("doc_id").cast("string")
      val k = pmod(col("doc_id"), lit(4L)) + 1L
      val stored = concat(
        member("docs/", lit("")),
        member("docs/read.txt", concat(lit("alpha "), id)),
        member("notes.md", concat(lit("note "),
          pmod(col("doc_id"), lit(7L)).cast("string"))))
      val payload = when(pmod(col("doc_id"), lit(2L)) === 0, stored)
        .otherwise(unhex(ddZipHex(k)))
      val fixture = t(s, dir, "documents")
        .select(col("doc_id"), payload.as("payload")).localCheckpoint()
      Multimodal.zipFileTexts(fixture).orderBy("doc_id", "name")
    }),
    // parquet footer census over pinned pyarrow files: exact rows,
    // row groups, writer string and schema leaves straight from the
    // thrift-compact footer; %3==2 docs break the tail magic — null
    // parquet DATA decode: row-group-0 page chain of the pinned
    // pyarrow file — snappy pages, PLAIN dictionary + RLE_DICTIONARY
    // indices, both physical types — values sampled with NO reader
    // stack; junk docs one null audit row
    "q338_parquet_page" -> ((s, dir) => {
      val m = pmod(col("doc_id"), lit(3L))
      val pv = when(m === 0,
          Multimodal.parquetPageValues(unhex(lit(pqFlatHex)), "id"))
        .when(m === 1,
          Multimodal.parquetPageValues(unhex(lit(pqFlatHex)), "name"))
      t(s, dir, "documents")
        .select(col("doc_id"), pv.as("__p"))
        .select(col("doc_id"), col("__p.ptype").as("ptype"),
          col("__p.codec").as("codec"),
          col("__p.encoding").as("encoding"),
          col("__p.num_values").as("num_values"),
          posexplode(coalesce(col("__p.values"),
            array(lit(null).cast("string")))).as(Seq("pos", "value")))
        .select(col("doc_id"), col("ptype"), col("codec"), col("encoding"),
          col("num_values"), col("pos").cast("long").as("pos"),
          col("value"))
        .orderBy("doc_id", "pos")
    }),
    "q286_parquet_meta" -> ((s, dir) => {
      val corrupt = pqFlatHex.dropRight(2) + "58" // tail magic broken
      val m = pmod(col("doc_id"), lit(3L))
      val hexStr = when(m === 0, lit(pqFlatHex))
        .when(m === 1, lit(pqNestedHex)).otherwise(lit(corrupt))
      val meta = Multimodal.parquetMeta(unhex(hexStr))
      t(s, dir, "documents")
        .select(col("doc_id"), meta.as("__m"))
        .select(col("doc_id"),
          col("__m.version").as("version"),
          col("__m.num_rows").as("num_rows"),
          col("__m.n_row_groups").as("n_row_groups"),
          col("__m.created_by").as("created_by"),
          when(col("__m").isNotNull, size(col("__m.columns")))
            .as("n_cols"),
          when(col("__m").isNotNull, array_join(
            transform(col("__m.columns"), c => concat_ws(":",
              c.getField("path"), c.getField("ptype"),
              c.getField("repetition"))), ";")).as("cols_ddl"))
        .orderBy("doc_id")
    }),
    // orc tail census over pinned pyarrow files: codec, exact rows,
    // stripes, top-level columns from the protobuf footer — all four
    // decodable codecs (none, zlib-deflate, snappy and lz4 raw
    // blocks); %5==4 docs break the head magic — null
    // ORC DATA decode: stripe-0 values of BOTH columns out of the
    // five pinned pyarrow files (all decodable codecs; the zstd file
    // carries different content by construction) — no reader stack;
    // corrupt docs one null audit row
    "q342_orc_values" -> ((s, dir) => {
      val corrupt = "58" + orcPlainHex.drop(2)
      val m = pmod(col("doc_id"), lit(6L))
      val hexStr = when(m === 0, lit(orcPlainHex))
        .when(m === 1, lit(orcZlibHex))
        .when(m === 2, lit(orcSnappyHex))
        .when(m === 3, lit(orcLz4Hex))
        .when(m === 4, lit(orcZstdHex)).otherwise(lit(corrupt))
      val fixture = t(s, dir, "documents")
        .select(col("doc_id"), unhex(hexStr).as("payload")).localCheckpoint()
      fixture.select(col("doc_id"),
          Multimodal.orcColumnValues(col("payload"), "id").as("__i"),
          Multimodal.orcColumnValues(col("payload"), "name").as("__n"))
        .select(col("doc_id"), col("__i.codec").as("codec"),
          col("__i.encoding").as("encoding"),
          col("__i.n_values").as("n_values"),
          posexplode(coalesce(col("__n.values"),
            array(lit(null).cast("string")))).as(Seq("pos", "name_val")),
          col("__i.values").as("__iv"))
        .select(col("doc_id"), col("codec"), col("encoding"),
          col("n_values"), col("pos").cast("long").as("pos"),
          element_at(col("__iv"), col("pos").cast("int") + 1).as("id_val"),
          col("name_val"))
        .orderBy("doc_id", "pos")
    }),
    "q287_orc_meta" -> ((s, dir) => {
      val corrupt = "58" + orcPlainHex.drop(2) // head magic broken
      val m = pmod(col("doc_id"), lit(6L))
      val hexStr = when(m === 0, lit(orcPlainHex))
        .when(m === 1, lit(orcZlibHex))
        .when(m === 2, lit(orcSnappyHex))
        .when(m === 3, lit(orcLz4Hex))
        .when(m === 4, lit(orcZstdHex)).otherwise(lit(corrupt))
      val meta = Multimodal.orcMeta(unhex(hexStr))
      t(s, dir, "documents")
        .select(col("doc_id"), meta.as("__m"))
        .select(col("doc_id"),
          col("__m.compression").as("compression"),
          col("__m.num_rows").as("num_rows"),
          col("__m.n_stripes").as("n_stripes"),
          when(col("__m").isNotNull, size(col("__m.columns")))
            .as("n_cols"),
          when(col("__m").isNotNull, array_join(
            transform(col("__m.columns"), c => concat_ws(":",
              c.getField("name"), c.getField("otype"))), ";"))
            .as("cols_ddl"))
        .orderBy("doc_id")
    }),
    // xz decompression against PINNED reference streams (stock xz
    // CLI output embedded as constants): crc64 single-block, a
    // two-block stream with declared sizes, concatenated streams,
    // the zero-block empty stream; %6==5 docs flip a payload byte
    // and a check must refuse
    "q295_xz" -> ((s, dir) => {
      val hello = "fd377a585a000004e6d6b44604c0141021011c00000000000000000088" +
        "b0670801000f68656c6c6f207a73746420776f726c64002edac54b4bc5" +
        "6ebf00013010bc9377e21fb6f37d010000000004595a"
      val wiki = "fd377a585a000004e6d6b44604c022d80421011c000000000000000059" +
        "403d82e00257001a5d003b9a49b20601a21c0a62a3eeafb0a5ffe33d4f" +
        "b914734cfb0000000000520007283a836d5c00013ed804000000cf11c2" +
        "cbb1c467fb020000000004595a"
      val runs2b = "fd377a585a000004e6d6b44603c00e800121011c000000008393521ee0" +
        "007f00065d0030eed600000000000082ff44dfd04f60a203c00e800121" +
        "011c000000008393521ee0007f00065d0030eed600000000000082ff44" +
        "dfd04f60a203c0122f21011c0000000000d48f4e34e0002e000a5d0030" +
        "ee2e653719526800000000000bc4dddce81880cf00032680012680012a" +
        "2f000061aca87914173b30030000000004595a"
      val empty = "fd377a585a000004e6d6b446000000001cdf44211fb6f37d0100000000" +
        "04595a"
      // corrupt: one payload byte of wiki flipped (offset 40)
      val corrupt = wiki.substring(0, 80) +
        "%02x".format(Integer.parseInt(wiki.substring(80, 82), 16) ^ 0x55) +
        wiki.substring(82)
      val m = pmod(col("doc_id"), lit(6L))
      val hexStr = when(m === 0, lit(hello)).when(m === 1, lit(wiki))
        .when(m === 2, lit(runs2b)).when(m === 3, lit(empty))
        .when(m === 4, lit(hello + runs2b)) // concatenated streams
        .otherwise(lit(corrupt))
      t(s, dir, "documents")
        .select(col("doc_id"),
          decode(graft.functions.XzPayload(unhex(hexStr), 1 << 20),
            "UTF-8").as("xz_text"))
        .orderBy("doc_id")
    }),
    // RTF text: engine-built per-doc documents exercising control
    // words, a dropped {\*\generator} destination, cp1252 hex and
    // unicode escapes; %4==3 docs are unbalanced and must refuse
    "q297_rtf_text" -> ((s, dir) => {
      val id = col("doc_id").cast("string")
      val rtfDoc = concat(
        lit("{\\rtf1\\ansi\\deff0 {\\fonttbl{\\f0 Times;}}" +
          "{\\*\\generator graft;}\\f0\\fs24 Doc \\b "), id,
        lit("\\b0  body caf\\'e9 \\u8364?"),
        pmod(col("doc_id"), lit(9L)).cast("string"),
        lit(".\\par Tail "), id, lit(".\\par}"))
      val payload = when(pmod(col("doc_id"), lit(4L)) === 3,
        concat(lit("{\\rtf1 broken "), id)).otherwise(rtfDoc)
      t(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.RtfText(payload.cast("binary"), 1 << 20)
            .as("rtf_text"))
        .orderBy("doc_id")
    }),
    // legacy .doc text through the piece-table tier: a spec-exact
    // Word97 compound file (mini-stream WordDocument + 0Table Clx,
    // one cp1252 and one UTF-16 piece); m1 flips the FIB fEncrypted
    // bit (refusal), m2 breaks the CFB signature — both null
    "q296_doc_text" -> ((s, dir) => {
      val doc = "d0cf11e0a1b11ae1000000000000000000000000000000003e000300fe" +
        "ff09000600000000000000000000000100000001000000000000000010" +
        "00000200000001000000feffffff0000000000000000ffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "fffffffffffffffffffffffffffffffffffffffdfffffffefffffffeff" +
        "ffff0400000005000000feffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffff52006f006f007400200045006e00740072007900" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "00000000000000000000000000000016000501ffffffffffffffff0100" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "00000000000000000003000000400400000000000057006f0072006400" +
        "44006f00630075006d0065006e00740000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000001a00" +
        "0201ffffffffffffffffffffffff000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000040000" +
        "0000000030005400610062006c00650000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "000000000000000000000e000201ffffffffffffffffffffffff000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000010000000210000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000001" +
        "0000000200000003000000040000000500000006000000070000000800" +
        "0000090000000a0000000b0000000c0000000d0000000e0000000f0000" +
        "00fefffffffeffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffffffffffffffffffffffff" +
        "ffffffffffffffffffffffffffffffffffffeca5c10000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000038000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000210000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "00000000000000004c656761637920576f726420746578742e20436166" +
        "e92072e973756de92e0d55006e00690063006f00640065002000700069" +
        "00650063006500200014202000fc006e00ef0063006f00640065002e00" +
        "0d00000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "000000000000000000000000000000000000000000000000000000021c" +
        "000000000000001f00000038000000000000040040000000001f020000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000"
      // FIB flags high byte sits at file offset 2059 (container
      // sector 3 -> 2048, + 0x0B)
      val encrypted = doc.substring(0, 4118) +
        "%02x".format(Integer.parseInt(doc.substring(4118, 4120), 16) | 1) +
        doc.substring(4120)
      val corrupt = "58" + doc.drop(2)
      val m = pmod(col("doc_id"), lit(3L))
      val hexStr = when(m === 0, lit(doc))
        .when(m === 1, lit(encrypted)).otherwise(lit(corrupt))
      t(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.DocTextExtract(unhex(hexStr), 1 << 24)
            .as("doc_text"))
        .orderBy("doc_id")
    }),
    // CFB/OLE2 census: an engine-built compound file per doc (header
    // + FAT + directory + one stream sector, the MS-CFB v3 layout) —
    // .doc-shaped on m0 (WordDocument stream), .xls-shaped on m1
    // (Workbook), m2 breaks the signature and keeps one null audit
    // row; sizes vary per doc so the oracle derives them
    "q294_cfb_meta" -> ((s, dir) => {
      def leHex(c: Column, nBytes: Int) = concat((0 until nBytes).map(i =>
        lpad(hex(shiftright(c, 8 * i).bitwiseAND(255L)), 2, "0")): _*)
      val id = col("doc_id").cast("string")
      val hdrHex = "D0CF11E0A1B11AE1" + "00" * 16 + "3E00" + "0300" +
        "FEFF" + "0900" + "0600" + "00" * 6 + "00000000" + "01000000" +
        "01000000" + "00000000" + "00100000" + "FEFFFFFF" + "00000000" +
        "FEFFFFFF" + "00000000" + "00000000" + "FF" * 432
      val fatHex = "FDFFFFFF" + "FEFFFFFF" + "FEFFFFFF" + "FF" * 500
      val rootName = "52006F006F007400200045006E007400720079000000000000000000000000" +
        "00000000000000000000000000000000000000000000000000000000000000" +
        "0000"
      val wordName = "57006F007200640044006F00630075006D0065006E00740000000000000000" +
        "00000000000000000000000000000000000000000000000000000000000000" +
        "0000"
      val bookName = "57006F0072006B0062006F006F006B00000000000000000000000000000000" +
        "00000000000000000000000000000000000000000000000000000000000000" +
        "0000"
      val summName = "0500530075006D006D0061007200790049006E0066006F0072006D00610074" +
        "0069006F006E00000000000000000000000000000000000000000000000000" +
        "0000"
      // a 128-byte directory entry: name(64) nameLen(2) type(1)
      // color(1) left(4) right(4) child(4) clsid(16) state(4)
      // times(16) start(4) size(8)
      def dirent(nameHex: String, nameLen: Int, otype: Int,
                 childHex: String, startHex: String,
                 sizeHex: Column): Column = concat(
        lit(nameHex +
          "%02X%02X".format(nameLen & 0xff, (nameLen >> 8) & 0xff) +
          "%02X".format(otype) + "01" +
          "FFFFFFFF" + "FFFFFFFF" + childHex + "00" * 16 + "00" * 4 +
          "00" * 16 + startHex),
        sizeHex)
      val docData = concat(lit("legacy word text "), id).cast("binary")
      val xlsData = concat(lit("excel cells "), id).cast("binary")
      val m = pmod(col("doc_id"), lit(3L))
      val data = when(m === 0, docData).otherwise(xlsData)
      val dlen = length(data).cast("long")
      val streamName = when(m === 0, lit(wordName)).otherwise(lit(bookName))
      val dirHex = concat(
        dirent(rootName, 22, 5, "01000000", "00000000",
          lit("00" * 8)),
        when(m === 0,
          dirent(wordName, 26, 2, "FFFFFFFF", "02000000",
            concat(leHex(dlen, 4), lit("00000000"))))
          .otherwise(
            dirent(bookName, 18, 2, "FFFFFFFF", "02000000",
              concat(leHex(dlen, 4), lit("00000000")))),
        dirent(summName, 40, 2, "FFFFFFFF", "FEFFFFFF", lit("00" * 8)),
        lit("00" * 128))
      val sigHex = when(m === 2, lit("58CF11E0A1B11AE1"))
        .otherwise(lit("D0CF11E0A1B11AE1"))
      val payload = concat(
        unhex(concat(sigHex, lit(hdrHex.drop(16) + fatHex))),
        unhex(dirHex), data,
        unhex(call_function("repeat", lit("00"),
          (lit(512L) - dlen).cast("int"))))
      val fixture = t(s, dir, "documents")
        .select(col("doc_id"), payload.as("payload")).localCheckpoint()
      val meta = Multimodal.cfbMeta(col("payload"))
      fixture
        .select(col("doc_id"), meta.as("__m"))
        .select(col("doc_id"), Multimodal.cfbKind(col("__m")).as("kind"),
          col("__m.major").as("major"),
          col("__m.sector_size").as("sector_size"),
          posexplode_outer(col("__m.entries")).as(Seq("entry_idx", "__e")))
        .select(col("doc_id"), col("kind"), col("major"),
          col("sector_size"), col("entry_idx").cast("long").as("entry_idx"),
          col("__e.name").as("name"), col("__e.otype").as("otype"),
          col("__e.start_sector").as("start_sector"),
          col("__e.size").as("size"))
        .orderBy(col("doc_id"), coalesce(col("entry_idx"), lit(-1L)))
    }),
    // the email/mbox tier composed end to end: per-doc mbox with a
    // multipart/alternative message (quoted-printable text/plain
    // preferred over html, mboxrd '>From ' unquoting proven by a line
    // that would otherwise be reply-stripped) and a base64 message
    // with an RFC 2047 B-encoded subject; every 5th mbox carries
    // non-message preamble junk that contributes nothing
    "q293_mbox_corpus" -> ((s, dir) => {
      val id = col("doc_id").cast("string")
      val subjB64 = base64(concat(lit("Bü "),
        pmod(col("doc_id"), lit(7L)).cast("string")).cast("binary"))
      val bodyB64 = base64(concat(lit("plain body "), id).cast("binary"))
      val mboxText = concat(
        when(pmod(col("doc_id"), lit(5L)) === 0,
          lit("list archive preamble\n")).otherwise(lit("")),
        lit("From alice@example.com Thu Jan  1 00:00:00 2026\n" +
          "Subject: Re: topic "), id, lit("\n" +
          "From: Alice <alice@x.io>\n" +
          "Date: Thu, 01 Jan 2026 00:00:00 +0000\n" +
          "Content-Type: multipart/alternative; boundary=\"b1\"\n\n" +
          "--b1\n" +
          "Content-Type: text/plain; charset=utf-8\n" +
          "Content-Transfer-Encoding: quoted-printable\n\n" +
          "Hello doc =3D "), id, lit("\n" +
          "> quoted line\n" +
          ">From here\n" +
          "bye\n" +
          "--b1\n" +
          "Content-Type: text/html\n\n" +
          "<p>html alt</p>\n" +
          "--b1--\n" +
          "From bob@example.com Thu Jan  2 00:00:00 2026\n" +
          "Subject: =?UTF-8?B?"), subjB64, lit("?=\n" +
          "From: Bob <bob@y.io>\n" +
          "Date: Fri, 02 Jan 2026 00:00:00 +0000\n" +
          "Content-Type: text/plain\n" +
          "Content-Transfer-Encoding: base64\n\n"),
        bodyB64, lit("\n"))
      TextAnalysis.mboxToCorpus(t(s, dir, "documents")
          .select(col("doc_id"), mboxText.as("text")))
        .orderBy("doc_id", "msg_idx")
    }),
    // parquet column-chunk statistics from the pinned pyarrow file:
    // per (row group x column) rows/bytes/value counts and the
    // Statistics null_count/min/max decoded per physical type; %4==3
    // docs break the head magic and keep one all-null row
    // (posexplode_outer) so the oracle proves fail-closure
    "q292_parquet_stats" -> ((s, dir) => {
      val corrupt = "58" + pqStatsHex.drop(2)
      val hexStr = when(pmod(col("doc_id"), lit(4L)) === 3, lit(corrupt))
        .otherwise(lit(pqStatsHex))
      t(s, dir, "documents")
        .select(col("doc_id"), posexplode_outer(
          Multimodal.parquetStats(unhex(hexStr))).as(Seq("pos", "__c")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          col("__c.row_group").as("row_group"),
          col("__c.rg_rows").as("rg_rows"),
          col("__c.rg_bytes").as("rg_bytes"),
          col("__c.path").as("path"), col("__c.ptype").as("ptype"),
          col("__c.codec").as("codec"),
          col("__c.num_values").as("num_values"),
          col("__c.compressed_bytes").as("compressed_bytes"),
          col("__c.uncompressed_bytes").as("uncompressed_bytes"),
          col("__c.null_count").as("null_count"),
          col("__c.min_value").as("min_value"),
          col("__c.max_value").as("max_value"))
        .orderBy(col("doc_id"), coalesce(col("pos"), lit(-1L)))
    }),
    // CDXJ crawl index: two well-formed entries (status/length/offset
    // through try_cast) and a json-less junk line that keeps its row
    // with null fields
    "q288_cdxj_parse" -> ((s, dir) => {
      val id = col("doc_id").cast("string")
      val text = concat(
        lit("com,example)/p"), id, lit(" 20260101000000 " +
          "{\"url\":\"https://example.com/p"), id,
        lit("\",\"mime\":\"text/html\",\"status\":\"200\"," +
          "\"digest\":\"sha1:AB"), pmod(col("doc_id"), lit(16L))
          .cast("string"),
        lit("\",\"length\":\"1234\",\"offset\":\""),
        (col("doc_id") * 100L).cast("string"),
        lit("\",\"filename\":\"crawl-00.warc.gz\"}\n" +
          "org,site)/x 20260102000000 {\"url\":\"https://site.org/x\"," +
          "\"status\":\"404\",\"mime\":\"text/plain\",\"length\":\"9\"," +
          "\"offset\":\"77\",\"filename\":\"crawl-01.warc.gz\"}\n" +
          "badline-no-json"))
      TextAnalysis.cdxjParse(
          t(s, dir, "documents").select(col("doc_id"), text.as("text")))
        .orderBy("doc_id", "pos")
    }),
    // sqlite header census: page size (raw 1 => 65536), page count,
    // encoding, user version, library version — fixed-offset slices;
    // every 5th doc breaks the magic and the struct nulls
    // SQLite table-row decode: the REAL-library-written small.db
    // (tools/make_sqlite_fixture.py) — every serial type through the
    // sqlite_master root-page resolution and the record walk; junk
    // docs one null audit row
    "q341_sqlite_rows" -> ((s, dir) => {
      val smallDb = "53514c69746520666f726d61742033000200010100402020000000030000000300000000000000000000000200000004000000000000000000000001000000000000000000000000000000000000000000000000000000000000000000000003002e63010d00000002017f0001b5017f0000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000034020617171701497461626c656c616e67736c616e677303435245415445205441424c45206c616e67732028636f646520544558542949010617151501777461626c65646f6373646f637302435245415445205441424c4520646f637320286120494e54454745522c2062205245414c2c206320544558542c206420424c4f42290d0000000b01450001ea01e301cf01a20197018c0181017501670157014500000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000100b050600130080000000000000006e65670e0a0506000f007fffffffffffffff7a0c090505000f007fffffffffff770a080504000f007fffffff7609070503000f007fffff7509060502010f007fff027409050502000010ff7f00102b04050105490e7f0002540be400787878787878787878787878787878787878787878787878787878787878ff12030509071700bff8000000000000636166c3a905020508000d0c140105000717103fd000000000000068656c6c6f01020d0000000101fa0001fa0000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000000004010211656e"
      val m = pmod(col("doc_id"), lit(2L))
      val hexStr = when(m === 0, lit(smallDb)).otherwise(hex(lit("junk")))
      val rt = "struct<rowid:bigint,vals:array<string>>"
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.sqliteRows(unhex(hexStr), "docs").as("__s"))
        .select(col("doc_id"), col("__s.root_page").as("root_page"),
          col("__s.n_rows").as("n_rows"),
          posexplode(coalesce(
            when(size(col("__s.rows")) > 0, col("__s.rows").cast(s"array<$rt>")),
            array(lit(null).cast(rt)))).as(Seq("pos", "__r")))
        .select(col("doc_id"), col("root_page"), col("n_rows"),
          col("pos").cast("long").as("pos"),
          col("__r.rowid").as("rowid"),
          element_at(col("__r.vals"), 1).as("a"),
          element_at(col("__r.vals"), 2).as("b"),
          element_at(col("__r.vals"), 3).as("c"),
          element_at(col("__r.vals"), 4).as("d"))
        .orderBy("doc_id", "pos")
    }),
    "q289_sqlite_meta" -> ((s, dir) => {
      def be32(c: Column) = lpad(hex(c), 8, "0")
      val pageHex = when(pmod(col("doc_id"), lit(2L)) === 0, lit("1000"))
        .otherwise(lit("0001"))
      val hexStr = concat(
        when(pmod(col("doc_id"), lit(5L)) === 0, lit("43"))
          .otherwise(lit("53")),
        lit("514C69746520666F726D6174203300"),
        pageHex, lit("010100402020"), be32(col("doc_id")),
        be32(pmod(col("doc_id"), lit(50L)) + 1L),
        lit("0" * 48),
        be32(pmod(col("doc_id"), lit(3L)) + 1L),
        be32(pmod(col("doc_id"), lit(7L))),
        lit("0" * 64),
        lit("002E7689"))
      val meta = Multimodal.sqliteMeta(unhex(hexStr))
      t(s, dir, "documents")
        .select(col("doc_id"), meta.as("__m"))
        .select(col("doc_id"),
          col("__m.page_size").as("page_size"),
          col("__m.n_pages").as("n_pages"),
          col("__m.encoding").as("encoding"),
          col("__m.user_version").as("user_version"),
          col("__m.sqlite_version").as("sqlite_version"))
        .orderBy("doc_id")
    }),
    // xlsx cell grid: shared (t="s"), inline and numeric cells with
    // base-26 column refs (AA2 => col 27); doc_id%4==0 adds a second
    // sheet; every 9th doc lacks the sheet member entirely — no rows
    "q278_xlsx_cells" -> ((s, dir) => {
      def leHex(c: Column, nBytes: Int) = concat((0 until nBytes).map(i =>
        lpad(hex(shiftright(c, 8 * i).bitwiseAND(255L)), 2, "0")): _*)
      def ascHex(str: String) =
        str.getBytes("ISO-8859-1").map("%02X".format(_)).mkString
      def member(name: String, body: Column) = {
        val bb = body.cast("binary")
        val bl = length(bb).cast("long")
        concat(unhex(concat(lit("504B0304140000000000" + "00000000"),
          leHex(crc32(bb), 4), leHex(bl, 4), leHex(bl, 4),
          lit("%02X000000".format(name.length)))),
          lit(name).cast("binary"), bb)
      }
      val id = col("doc_id").cast("string")
      val sst = concat(lit("<sst><si><t>alpha "), id,
        lit("</t></si><si><r><t>beta </t></r><r><t>two</t></r></si></sst>"))
      val sheet1 = concat(
        lit("<worksheet><sheetData><row r=\"1\"><c r=\"A1\" t=\"s\"><v>"),
        pmod(col("doc_id"), lit(2L)).cast("string"),
        lit("</v></c><c r=\"B1\"><v>3.5</v></c></row>" +
          "<row r=\"2\"><c r=\"C2\" t=\"inlineStr\"><is><t>inl &amp; " +
          "ine</t></is></c><c r=\"D2\"/><c r=\"AA2\"><v>"),
        pmod(col("doc_id"), lit(100L)).cast("string"),
        lit("</v></c></row></sheetData></worksheet>"))
      val sheet2 = lit("<worksheet><sheetData><row r=\"3\">" +
        "<c r=\"B3\"><v>9</v></c></row></sheetData></worksheet>")
      val hasSheet = pmod(col("doc_id"), lit(9L)) =!= 0
      val hasTwo = pmod(col("doc_id"), lit(4L)) === 0
      val payload = concat(member("xl/sharedStrings.xml", sst),
        when(hasSheet, member("xl/worksheets/sheet1.xml", sheet1))
          .otherwise(lit(Array.empty[Byte])),
        when(hasSheet && hasTwo, member("xl/worksheets/sheet2.xml", sheet2))
          .otherwise(lit(Array.empty[Byte])))
      val fixture = t(s, dir, "documents")
        .select(col("doc_id"), payload.as("payload")).localCheckpoint()
      Multimodal.xlsxCells(fixture).orderBy("doc_id", "sheet", "row", "col")
    }),
    // epub chapter text: spine order (manifest deliberately lists
    // ch2 first), hrefs relative to the OPF directory, htmlToText
    // cleaning; every 6th doc lacks the ch2 member — null text row
    "q279_epub_chapters" -> ((s, dir) => {
      def leHex(c: Column, nBytes: Int) = concat((0 until nBytes).map(i =>
        lpad(hex(shiftright(c, 8 * i).bitwiseAND(255L)), 2, "0")): _*)
      def member(name: String, body: Column) = {
        val bb = body.cast("binary")
        val bl = length(bb).cast("long")
        concat(unhex(concat(lit("504B0304140000000000" + "00000000"),
          leHex(crc32(bb), 4), leHex(bl, 4), leHex(bl, 4),
          lit("%02X000000".format(name.length)))),
          lit(name).cast("binary"), bb)
      }
      val id = col("doc_id").cast("string")
      val container = lit("<container><rootfiles>" +
        "<rootfile full-path=\"ops/pkg.opf\" media-type=\"x\"/>" +
        "</rootfiles></container>")
      val opf = lit("<package><manifest>" +
        "<item href=\"ch2.xhtml\" id=\"c2\" media-type=\"x\"/>" +
        "<item id=\"c1\" href=\"ch1.xhtml\" media-type=\"x\"/>" +
        "</manifest><spine><itemref idref=\"c1\"/>" +
        "<itemref idref=\"c2\"/></spine></package>")
      val ch1 = concat(lit("<html><body><p>Chapter one of book "), id,
        lit(" &amp; intro.</p></body></html>"))
      val ch2 = concat(lit("<html><body><p>Second "),
        substring(col("text"), 1, 20), lit("</p></body></html>"))
      val hasCh2 = pmod(col("doc_id"), lit(6L)) =!= 0
      val payload = concat(
        member("META-INF/container.xml", container),
        member("ops/pkg.opf", opf),
        member("ops/ch1.xhtml", ch1),
        when(hasCh2, member("ops/ch2.xhtml", ch2))
          .otherwise(lit(Array.empty[Byte])))
      val fixture = t(s, dir, "documents")
        .select(col("doc_id"), payload.as("payload")).localCheckpoint()
      Multimodal.epubChapters(fixture).orderBy("doc_id", "chapter_idx")
    }),
    // wikitext cleaning: emphasis, piped+plain links, a ref holding a
    // template, a heading, a list marker, nested templates, a labeled
    // external link and a multi-line wiki table — expected text
    // derived arithmetically line by line
    "q280_wikitext_clean" -> ((s, dir) => {
      val id = col("doc_id").cast("string")
      val k = pmod(col("doc_id"), lit(5L)).cast("string")
      val wiki = concat(
        lit("'''Intro''' to [[Page "), id, lit("|label "), id,
        lit("]] and [[Other]].<ref>x{{c}}</ref> After.\n== Head "), id,
        lit(" ==\n* item "), k,
        lit("\nText {{a|{{b}}}} mid [http://ex.com/"), id,
        lit(" link "), id,
        lit("] tail.\n{| class=\"w\"\n|-\n| c1 || c2\n|}\nTail "), id,
        lit(".\nKeep <nowiki>{{l|"), k,
        lit("}}</nowiki> and<!-- {{bad}} {| poison --> visible."))
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.wikitextClean(wiki).as("clean"))
        .orderBy("doc_id")
    }),
    // JSONL schema inference closing the census loop: nulls on even
    // docs make b nullable, %11 docs are malformed and contribute
    // nothing, meta.deep sits at the depth bound (map fallback) —
    // the collapsed DDL is a single deterministic artifact
    "q281_json_infer_schema" -> ((s, dir) => {
      val id = col("doc_id").cast("string")
      val b = when(pmod(col("doc_id"), lit(2L)) === 0, lit("null"))
        .otherwise(concat(lit("\"s"), pmod(col("doc_id"), lit(9L))
          .cast("string"), lit("\"")))
      val json = when(pmod(col("doc_id"), lit(11L)) === 0, lit("{broken"))
        .otherwise(concat(lit("{\"a\":"), id, lit(",\"b\":"), b,
          lit(",\"flag\":true,\"tags\":[1],\"meta\":{\"lang\":\"en\"," +
            "\"deep\":{\"z\":1}}}")))
      val census = TextAnalysis.jsonPathCensus(
        t(s, dir, "documents").select(json.as("json")), maxDepth = 2)
      TextAnalysis.jsonInferSchema(census, maxDepth = 2)
    }),
    // MediaWiki dump pages: an article, a redirect and a talk page
    // per dump — titles/text entity-decoded, the page's own id (not
    // the revision's), redirect target surfaced
    "q282_wiki_pages" -> ((s, dir) => {
      val fixture = t(s, dir, "documents")
        .select(col("doc_id"), wikiDumpXml(col("doc_id")).as("xml"))
      TextAnalysis.wikiDumpPages(fixture)
        .select(col("doc_id"), col("pos"), col("title"), col("ns"),
          col("page_id"), col("redirect"),
          length(col("text")).cast("long").as("text_len"))
        .orderBy("doc_id", "pos")
    }),
    // the Wikipedia chain composed end to end: dump XML → pages →
    // ns-0 non-redirect filter → wikitextClean — the corpus rows a
    // pretraining pipeline actually keeps
    "q283_wiki_corpus" -> ((s, dir) => {
      val fixture = t(s, dir, "documents")
        .select(col("doc_id"), wikiDumpXml(col("doc_id")).as("xml"))
      TextAnalysis.wikiDumpPages(fixture)
        .filter(col("ns") === 0 && col("redirect").isNull)
        .select(col("doc_id"), col("page_id"), col("title"),
          TextAnalysis.wikitextClean(col("text")).as("clean"))
        .orderBy("doc_id")
    }),
    // bzip2 decompression against PINNED reference streams (stock-
    // bzip2 output embedded as constants — the kernel is graded
    // against the real format): simple text, repeated text, long
    // runs, the empty stream, two CONCATENATED streams (the
    // pbzip2/multistream shape) decoding back-to-back; %6==5 docs
    // flip a payload byte and the CRC must refuse
    "q284_bunzip2" -> ((s, dir) => {
      val hello = "425A68393141592653591F4E70BA0000031980400010001664D09" +
        "020003100D0014C034696A185D1DC8F13A0F0BB9229C28480FA7385D0"
      val wiki = "425A68393141592653590BF3E11E00011791804000062A46C0200" +
        "0508069A680A549A1A64C89E89A1322604F44D89E09B1362704D09B130270" +
        "4FC5DC914E142402FCF84780"
      val runs = "425A6839314159265359D11925BB00000291008020260100082000" +
        "30C0064C6A72458CC5F177245385090D11925BB0"
      val empty = "425A683917724538509000000000"
      // corrupt: one payload byte of `hello` flipped (offset 20)
      val corrupt = hello.substring(0, 40) +
        "%02X".format(Integer.parseInt(hello.substring(40, 42), 16) ^ 0x55) +
        hello.substring(42)
      val m = pmod(col("doc_id"), lit(6L))
      val hexStr = when(m === 0, lit(hello)).when(m === 1, lit(wiki))
        .when(m === 2, lit(runs)).when(m === 3, lit(empty))
        .when(m === 4, lit(hello + wiki)) // concatenated streams (pbzip2)
        .otherwise(lit(corrupt))
      t(s, dir, "documents")
        .select(col("doc_id"),
          decode(graft.functions.Bunzip2(unhex(hexStr), 1 << 20), "UTF-8")
            .as("bz_text"))
        .orderBy("doc_id")
    }),
    // 7z archive listing — a pinned commons-compress archive (dir +
    // two files); m1 flips the next-header CRC and must refuse with
    // one null audit row
    // docx AUX members: body + header/footnotes through docxFullText
    // in archive order; every 3rd doc body-only (aux absent -> body
    // unchanged), every 5th corrupt -> null
    "q321_docx_aux" -> ((s, dir) => {
      def leHex(c: Column, nBytes: Int) = concat((0 until nBytes).map(i =>
        lpad(hex(shiftright(c, 8 * i).bitwiseAND(255L)), 2, "0")): _*)
      def member(name: String, body: Column) = {
        val bb = body.cast("binary")
        val bl = length(bb).cast("long")
        concat(unhex(concat(lit("504B0304140000000000" + "00000000"),
          leHex(crc32(bb), 4), leHex(bl, 4), leHex(bl, 4),
          lit("%02X000000".format(name.length)))),
          lit(name).cast("binary"), bb)
      }
      val id = col("doc_id").cast("string")
      val docXml = concat(lit("<w:document><w:body><w:p><w:r><w:t>Body "),
        id, lit(" &amp; text</w:t></w:r></w:p></w:body></w:document>"))
      val hdrXml = concat(lit("<w:hdr><w:p><w:r><w:t>Head "),
        pmod(col("doc_id"), lit(7L)).cast("string"),
        lit("</w:t></w:r></w:p></w:hdr>"))
      val fnXml = lit("<w:footnotes><w:p><w:r><w:t>note A</w:t>" +
        "</w:r></w:p></w:footnotes>")
      val hasAux = pmod(col("doc_id"), lit(3L)) =!= 0
      val corrupt = pmod(col("doc_id"), lit(5L)) === 0
      val payload = when(corrupt, lit("junk".getBytes("UTF-8")))
        .otherwise(concat(member("word/document.xml", docXml),
          when(hasAux, concat(member("word/header1.xml", hdrXml),
            member("word/footnotes.xml", fnXml)))
            .otherwise(lit(Array.empty[Byte]))))
      val fixture = t(s, dir, "documents")
        .select(col("doc_id"), payload.as("payload")).localCheckpoint()
      fixture.select(col("doc_id"),
          Multimodal.docxFullText(col("payload")).as("text"))
        .orderBy("doc_id")
    }),
    // Native-JPEG pinned hashes: the tier that used to be per-JRE is
    // engine-exact since round 15 — gray, 4:2:0-with-restarts and
    // 4:4:4 engine-built baselines (tools/make_jpeg_fixture.py, the
    // python reference decoder shares the pinned integer contract)
    // hash to constants; junk docs null
    // PROGRESSIVE JPEG: the engine-built SOF2 spectral-selection
    // fixture (tools/make_jpeg_fixture.py jProg420) carries the SAME
    // quantized coefficients as q335's sequential 4:2:0, so it must
    // decode to the SAME pinned hash — the progressive path
    // cross-checked against the independently verified baseline one;
    // junk docs null
    "q340_jpeg_progressive" -> ((s, dir) => {
      val jProg = "ffd8ffdb004300100b0a101828333d0c0c0e131a3a3c370e0d1018283945380e11161d3357503e12162538446d674d182337405168715c31404e5767797865485c5f6270646763ffdb0043011112182f6363636312151a4263636363181a3863636363632f426363636363636363636363636363636363636363636363636363636363636363636363636363ffc20011080010001003012200021101031101ffc400160001020000000000000000000000000000050001ffc4001501020000000000000000000000000000000003ffc4001502020000000000000000000000000000000003ffda000c0301000210032000000009be1dd7ffc40023100001020504040000000000000000000001020400031123410521316114323391ffda0008010100013f00d259751aa3bf1a4db5526aac37a729a8dc8a11e83f1a4692cba878f54ee6929528ca16da270258c8141f43bf15c623ffc4001b11000105020000000000000000000000000111213242a10002ffda0008010201013f00f4346875477fffc4001a120002030200000000000000000000000002a10103330021ffda0008010302013f0009aa30a4c943faefffd9"
      val m = pmod(col("doc_id"), lit(2L))
      val hexStr = when(m === 0, lit(jProg)).otherwise(hex(lit("junk")))
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.imageDhash(unhex(hexStr)).as("dhash"))
        .orderBy("doc_id")
    }),
    "q335_jpeg_dhash" -> ((s, dir) => {
      val jGray = "ffd8ffdb004300100b0a101828333d0c0c0e131a3a3c370e0d1018283945380e11161d3357503e12162538446d674d182337405168715c31404e5767797865485c5f6270646763ffc0000b080010001001011100ffc400160001020000000000000000000000000000050001ffc40023100001020504040000000000000000000001020400031123410521316114323391ffda0008010100003f000b4965d437aa3bf1a4db5526aac37a729a8dc8a11e83f1a47d2597501bc7aa773494a94650b6d13812c640a0fa1df8ae311fffd9"
      val j420 = "ffd8ffdb004300100b0a101828333d0c0c0e131a3a3c370e0d1018283945380e11161d3357503e12162538446d674d182337405168715c31404e5767797865485c5f6270646763ffdb0043011112182f6363636312151a4263636363181a3863636363632f426363636363636363636363636363636363636363636363636363636363636363636363636363ffc00011080010001003012200021101031101ffc400160001020000000000000000000000000000050001ffc40023100001020504040000000000000000000001020400031123410521316114323391ffc4001501020000000000000000000000000000000003ffc4001b11000105020000000000000000000000000111213242a10002ffc4001502020000000000000000000000000000000003ffc4001a120002030200000000000000000000000002a10103330021ffdd00040002ffda000c03010002110322003f000b4965d437aa3bf1a4db5526aac37a729a8dc8a11e83f1a47d2597501bc7aa773494a94650b6d13812c640a0fa1df8ae3117e868d0ea8ea09aa30a4c943faeffd9"
      val j444 = "ffd8ffdb004300100b0a101828333d0c0c0e131a3a3c370e0d1018283945380e11161d3357503e12162538446d674d182337405168715c31404e5767797865485c5f6270646763ffdb0043011112182f6363636312151a4263636363181a3863636363632f426363636363636363636363636363636363636363636363636363636363636363636363636363ffc00011080010001003011100021101031101ffc400160001020000000000000000000000000000050001ffc40023100001020504040000000000000000000001020400031123410521316114323391ffc400160101020000000000000000000000000000020003ffc400211100010205060000000000000000000000010002042272b1b21213233181a1ffc400160201020000000000000000000000000000040005ffc400211200010205060000000000000000000000020003010434416211316191a1d1ffda000c03010002110322003f000b4965d46605b23a936288d49629bd51df8d26daa935561bd394d46e4508f41f8d2186f19f320b9b5258afa4b2ea0b01db3a491d0fc219cf391a764079de3f788378f54ee6929528ca16da270258c8141f43bf15c621443646d42c51cc1c2a874e37d2dd6cbfffd9"
      val m = pmod(col("doc_id"), lit(4L))
      val hexStr = when(m === 0, lit(jGray)).when(m === 1, lit(j420))
        .when(m === 2, lit(j444)).otherwise(hex(lit("junk")))
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.imageDhash(unhex(hexStr)).as("dhash"))
        .orderBy("doc_id")
    }),
    // WebP VP8L perceptual dHash: the SIXTH format hashing EQUAL —
    // engine-built lossless streams from the INDEPENDENT python
    // encoder (tools/make_webp_fixture.py): literal-only, an
    // all-14-mode predictor transform, and a VP8X-wrapped variant all
    // decode pattern A to the SAME pinned constant as q320's GIF and
    // q326's TIFF; lossy VP8 refuses, junk docs null
    "q332_webp_dhash" -> ((s, dir) => {
      val vLit = "524946465c030000574542505650384c500300002f0fc003007080000050ce78c3c683873ffcf18b5f7ef2d38f7e78f0d8b0f160f060f060f060f060f060f060f07080000050ce78c3c683873ffcf18b5f7ef2d38f7e78f0d8b0f160f060f060f060f060f060f060f07080000050ce78c3c683873ffcf18b5f7ef2d38f7e78f0d8b0f160f060f060f060f060f060f060f0e87f000000080482402070381c854261b158a5a5a5128944a150a8d56a9d4e67341a2d168bdd6e77b95c5eaf170402c16030341a4d2412e9743a97cbadaaaa92c9642a954aabd51a0c06b3d96cb3d99c4ea7c7e30102815028148944e2f1782a95ca66b30502415d5d9d52a9d468347abdde643259ad5687c3e176bb7d3e1f180c86c3e1180c86442231180c1e8f2712899a9b9b7b7a7ac6c6c6161616b6b6b64e4e4eeeeeee3e3e3efcfdfd2322225028148140a0d1681c0e4728144aa5d2f6f6f6c1c1c1e9e9e9d5d5d5fdfdfdcbcbcbe7e7e7dfdfdf909090d8d8582c164b2693994c269fcf178bc572b9bcb7b7777c7c7c7171717b7bfbf4f4f4fefefef3f3332020203232322121213535352b2b2b3f3fbfacacacbebebea3a3636868686666666d6dede0e0e0eaeaeae5e5e5efef2f3434342e2e2e3939392323233737b7a8a8a8bababaa5a5a5afaf6f6262626969696767e7ececece1e1e1ebeb2b3030302a2a2a3131312d2d2d3b3bbba0a0a0bcbcbca1a1a1b3b3737878787676767d7dfdf0f0f0fafafaf5f5f5ffff3f2c2c2c3e3e3e2525253333332f2fafb8b8b8a6a6a6b5b5b5bfbf7f7272727979797777f7fcfcfcf1f1f1fbfb3b2828283a3a3a2929293d3d3d2727a7b0b0b0a2a2a2b1b1b1abab6b6464646e6e6e6363e3e8e8e8e6e6e6eded0d0000402010040281c3e128140a8bc52a2929a9adad6d6b6b1b1818989a9a5a5959d9dbdbbbb8b8787a7afaf9f901814030180c8d461389443a9dcee5722b2b2b9b9a9ababbbb474747e7e7e73737378f8f8f6f6f6fdfdfdffdfcfca050281289c4e3f1542a95cd660b04028944a25028d46ab54ea7331a8d168bc56eb7bb5c2eafd71b1c1c0c87c331180c89446230183c1e4f2412c96432954aa5d56a0d0683d96cb6d96c4ea7d3e3f10081c0f0f070140a45201068341a87c3110a8552a954a9546a341abd5e6f3299ac56abc3e170bbdd3e9f0f0c06c7c4c460b1583299cc6432f97cbe582c96cbe5"
      val vPred = "524946461a020000574542505650384c0d0200002f0fc003000103004886f9ff88fe07286a1e593d7b0fc28d033a5baabc35699f6df26a9a54175cc445177571c2892b71263905131c82bb7cbf1b0774b654796bd23edbe4d534a92eb8888b2eeae2841357e24c720a26380477f97e370ee86ca9f2d6a47db6c9ab69525d7011175dd4c50927aec499e4144c7008eef2fd112242922449922449922449922449922449920430336f6f6f5f5f5f2449922409000000006badb5d65a6bdb3600bbddeee3e3e3f7f797244992240100000060adb5d6ba5eafdbb601d8eff7dfdfdf7f7f7f2449922409000000006badb5d65a6bdb360033333333e3eeeeeeeeeededddddddddd9d9999793e9f3313c0ccccccccb8bbbbbbbbbb77777777777767e6f178cccccc043033333333eeeeeeeeeeeedddddddddddd99793e9f33333301cccccccc8cbbbbbbbbbb7b7777777777f7f178cccccccc4c0055555555a5aaaaaaaaaa1a1111111187c30100000000005455555595aaaaaaaaaa6a444444449c4e2792000000005055555555aaaaaaaaaaaa111111a7d3e97ebf030000000080aaaaaaaa5255555555558d88c3e1f0ffff1f1100000000004044444444cccccccccccc2e978baa56d56eb72349922449002222222262666666666676bbdd1e1f1f9f9f9ff7fb3d499224490210111111113333333333b3878787a7a7a7d7d7d7cfcf4f9224499204202222222266666666666611f1f2f2f2fefefef3f3439224499200"
      val vVp8x = "524946466e03000057454250565038580a000000000000000f00000f00005650384c500300002f0fc003007080000050ce78c3c683873ffcf18b5f7ef2d38f7e78f0d8b0f160f060f060f060f060f060f060f07080000050ce78c3c683873ffcf18b5f7ef2d38f7e78f0d8b0f160f060f060f060f060f060f060f07080000050ce78c3c683873ffcf18b5f7ef2d38f7e78f0d8b0f160f060f060f060f060f060f060f0e87f000000080482402070381c854261b158a5a5a5128944a150a8d56a9d4e67341a2d168bdd6e77b95c5eaf170402c16030341a4d2412e9743a97cbadaaaa92c9642a954aabd51a0c06b3d96cb3d99c4ea7c7e30102815028148944e2f1782a95ca66b30502415d5d9d52a9d468347abdde643259ad5687c3e176bb7d3e1f180c86c3e1180c86442231180c1e8f2712899a9b9b7b7a7ac6c6c6161616b6b6b64e4e4eeeeeee3e3e3efcfdfd2322225028148140a0d1681c0e4728144aa5d2f6f6f6c1c1c1e9e9e9d5d5d5fdfdfdcbcbcbe7e7e7dfdfdf909090d8d8582c164b2693994c269fcf178bc572b9bcb7b7777c7c7c7171717b7bfbf4f4f4fefefef3f3332020203232322121213535352b2b2b3f3fbfacacacbebebea3a3636868686666666d6dede0e0e0eaeaeae5e5e5efef2f3434342e2e2e3939392323233737b7a8a8a8bababaa5a5a5afaf6f6262626969696767e7ececece1e1e1ebeb2b3030302a2a2a3131312d2d2d3b3bbba0a0a0bcbcbca1a1a1b3b3737878787676767d7dfdf0f0f0fafafaf5f5f5ffff3f2c2c2c3e3e3e2525253333332f2fafb8b8b8a6a6a6b5b5b5bfbf7f7272727979797777f7fcfcfcf1f1f1fbfb3b2828283a3a3a2929293d3d3d2727a7b0b0b0a2a2a2b1b1b1abab6b6464646e6e6e6363e3e8e8e8e6e6e6eded0d0000402010040281c3e128140a8bc52a2929a9adad6d6b6b1b1818989a9a5a5959d9dbdbbbb8b8787a7afaf9f901814030180c8d461389443a9dcee5722b2b2b9b9a9ababbbb474747e7e7e73737378f8f8f6f6f6fdfdfdffdfcfca050281289c4e3f1542a95cd660b04028944a25028d46ab54ea7331a8d168bc56eb7bb5c2eafd71b1c1c0c87c331180c89446230183c1e4f2412c96432954aa5d56a0d0683d96cb6d96c4ea7d3e3f10081c0f0f070140a45201068341a87c3110a8552a954a9546a341abd5e6f3299ac56abc3e170bbdd3e9f0f0c06c7c4c460b1583299cc6432f97cbe582c96cbe5"
      val vLossy = "524946462c0000005745425056503820200000000000000000000000000000000000000000000000000000000000000000000000"
      val m = pmod(col("doc_id"), lit(5L))
      val hexStr = when(m === 0, lit(vLit)).when(m === 1, lit(vPred))
        .when(m === 2, lit(vVp8x)).when(m === 3, lit(vLossy))
        .otherwise(hex(lit("junk")))
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.imageDhash(unhex(hexStr)).as("dhash"))
        .orderBy("doc_id")
    }),
    // Matroska/WebM EBML census: engine-built spec-exact bytes
    // (tools/make_webm_fixture.py) — webm VP8+Opus with a dynamic
    // 1-byte TrackNumber splice (EBML carries no checksum), matroska
    // subtitle-only with the DEFAULT timescale and a 4-byte float
    // duration; junk docs one null audit row
    // AVI census completing the video-container trio: the pinned
    // RIFF fixture (tools/make_avi_fixture.py — avih 320x240 over
    // 250 frames, mjpg vids on the 30000/1001 clock -> 10010 ms,
    // pcm auds, movi skipped by size); junk docs one null audit row
    "q339_avi_meta" -> ((s, dir) => {
      val avi = "5249464618010000415649204c495354f40000006864726c6176696828000000409c0000000000000000000000000000fa00000000000000020000000000000040010000f00000004c495354640000007374726c7374726828000000766964736d6a7067000000000000000000000000e903000030750000000000002c010000000000007374726628000000000000000000000000000000000000000000000000000000000000000000000000000000000000004c4953544c0000007374726c73747268280000006175647370636d2000000000000000000000000001000000401f00000000000080380100000000007374726610000000000000000000000000000000000000004c495354100000006d6f7669303064630300000001020300"
      val m = pmod(col("doc_id"), lit(2L))
      val hexStr = when(m === 0, lit(avi)).otherwise(hex(lit("junk")))
      val tt = "struct<kind:string,handler:string,rate:bigint," +
        "scale:bigint,length:bigint>"
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.aviMeta(unhex(hexStr)).as("__a"))
        .select(col("doc_id"), col("__a.width").as("width"),
          col("__a.height").as("height"),
          col("__a.total_frames").as("total_frames"),
          col("__a.duration_ms").as("duration_ms"),
          col("__a.n_streams").as("n_streams"),
          posexplode(coalesce(
            when(size(col("__a.tracks")) > 0,
              col("__a.tracks").cast(s"array<$tt>")),
            array(lit(null).cast(tt)))).as(Seq("pos", "__t")))
        .select(col("doc_id"), col("width"), col("height"),
          col("total_frames"), col("duration_ms"), col("n_streams"),
          col("pos").cast("long").as("pos"),
          col("__t.kind").as("kind"), col("__t.handler").as("handler"),
          col("__t.rate").as("rate"), col("__t.scale").as("scale"),
          col("__t.length").as("length"))
        .orderBy("doc_id", "pos")
    }),
    "q331_webm_meta" -> ((s, dir) => {
      val m0pre = "1a45dfa3400d4286400101428240047765626d1853806740651549a96640142ad7b140030f42404489400840b38800000000001654ae6b4027ae4010d74001"
      val m0post = "83400101864005565f565038ae4011d740010283400102864006415f4f5055531f43b6754018777777777777777777777777777777777777777777777777"
      val m1 = "1a45dfa340114286400101428240086d6174726f736b6118538067402d1549a96640084489400444bb80001654ae6b4019ae4016d74001038340011186400b535f544558542f55544638"
      val num = pmod(col("doc_id"), lit(5L)) + 1L
      val m = pmod(col("doc_id"), lit(3L))
      val hexStr = when(m === 0, concat(lit(m0pre),
          lpad(hex(num), 2, "0"), lit(m0post)))
        .when(m === 1, lit(m1)).otherwise(hex(lit("junk")))
      val fixture = t(s, dir, "documents")
        .select(col("doc_id"), unhex(hexStr).as("payload")).localCheckpoint()
      val tt = "struct<track_num:bigint,track_type:string,codec_id:string>"
      fixture.select(col("doc_id"),
          Multimodal.webmMeta(col("payload")).as("__w"))
        .select(col("doc_id"), col("__w.doctype").as("doctype"),
          col("__w.timescale_ns").as("timescale_ns"),
          col("__w.duration_ms").as("duration_ms"),
          posexplode(coalesce(
            when(size(col("__w.tracks")) > 0,
              col("__w.tracks").cast(s"array<$tt>")),
            array(lit(null).cast(tt)))).as(Seq("pos", "__t")))
        .select(col("doc_id"), col("doctype"), col("timescale_ns"),
          col("duration_ms"), col("pos").cast("long").as("pos"),
          col("__t.track_num").as("track_num"),
          col("__t.track_type").as("track_type"),
          col("__t.codec_id").as("codec_id"))
        .orderBy("doc_id", "pos")
    }),
    // Ogg audio tier: engine-built spec-exact pages
    // (tools/make_ogg_fixture.py — the CRCs come from an INDEPENDENT
    // implementation, so the kernel's page verification is
    // cross-checked by construction): Vorbis tagged / Opus tagged
    // (pre-skip on the 48 kHz granule clock) / Vorbis zero-comment;
    // junk docs one null audit row
    "q330_ogg_meta" -> ((s, dir) => {
      val m0 = "4f6767530002ffffffffffffffff6f61726700000000a6d5f8c5011e01766f72626973000000000244ac0000000000000000000000000000b8014f6767530000ffffffffffffffff6f617267010000004ff773a5013503766f72626973050000006772616674020000000c0000005469746c653d536f6e6720410c0000004152544953543d5620417274014f676753000488580100000000006f61726702000000dbbc77550114aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"
      val m1 = "4f6767530002ffffffffffffffff6f6172670000000059b41aba01134f7075734865616401013801c05d00000000004f6767530000ffffffffffffffff6f6172670100000096babb5301284f70757354616773050000006772616674010000000f000000656e636f6465723d6f707573656e634f6767530004b8bc0000000000006f61726702000000deaed35a010abbbbbbbbbbbbbbbbbbbb"
      val m2 = "4f6767530002ffffffffffffffff6f61726700000000580179a7011e01766f726269730000000001401f0000000000000000000000000000b8014f6767530000ffffffffffffffff6f6172670100000099cc3548011503766f7262697305000000677261667400000000014f6767530004a00f0000000000006f61726702000000b18e857d0105cccccccccc"
      val m = pmod(col("doc_id"), lit(4L))
      val hexStr = when(m === 0, lit(m0)).when(m === 1, lit(m1))
        .when(m === 2, lit(m2)).otherwise(hex(lit("junk")))
      val fixture = t(s, dir, "documents")
        .select(col("doc_id"), unhex(hexStr).as("payload")).localCheckpoint()
      val tt = "struct<key:string,value:string>"
      fixture.select(col("doc_id"),
          Multimodal.oggMeta(col("payload")).as("__o"))
        .select(col("doc_id"), col("__o.codec").as("codec"),
          col("__o.channels").as("channels"),
          col("__o.sample_rate").as("sample_rate"),
          col("__o.duration_ms").as("duration_ms"),
          posexplode(coalesce(
            when(size(col("__o.tags")) > 0,
              col("__o.tags").cast(s"array<$tt>")),
            array(lit(null).cast(tt)))).as(Seq("pos", "__t")))
        .select(col("doc_id"), col("codec"), col("channels"),
          col("sample_rate"), col("duration_ms"),
          col("pos").cast("long").as("pos"),
          col("__t.key").as("key"), col("__t.value").as("value"))
        .orderBy("doc_id", "pos")
    }),
    // PDF ToUnicode CMap resolution: a page-structured CID PDF
    // (FlateDecode CMap from tools/make_pdf_cid_fixture.py: bfchar
    // H + U+0394, bfrange digits) whose show-string codes extract as
    // REAL text; m1 keeps a simple latin1-tier PDF in the same row
    // set, junk docs null audit fields. Dynamic digit codes are
    // fixed-width, so the payload is a flat literal concat
    // PDF /ObjStm expansion: the q329 CID document restructured the
    // modern-writer way — catalog/pages/page/font dicts deflated
    // inside a /Type /ObjStm object stream (PDF 1.5+), only the
    // content stream and the CMap top-level (committed tool
    // tools/make_pdf_objstm_fixture.py). Same dynamic digit codes;
    // junk docs null audit fields
    "q337_pdf_objstm" -> ((s, dir) => {
      val partA = "255044462d312e350a372030206f626a203c3c202f54797065202f4f626a53746d202f4e2034202f4669727374203230202f46696c746572202f466c6174654465636f6465202f4c656e67746820313633203e3e0a73747265616d0a78da658ec10ac23010447f65fe601b53eba5f46045112f52f5241e621b4b411a6992837fef2651100a2164f366664720c3023287c4aac012a290284bd0f9fdd2a05a39f5343de8a87a6d5998a14155fd2912a0c3d0595c65e037b6193f3a88b932dc93669692a8d1d6f8a9e584a0db1a26f121b8c977151fce1b1dbb2cf2798168a293bfbb3886cf0cb4565627b29bd4c3d5fb0d23731987d6741ac52fe603931a46120a656e6473747265616d0a656e646f626a0a342030206f626a203c3c202f4c656e677468203433203e3e0a73747265616d0a4254202f4631203132205466203c30303031303030323e20546a203c313033"
      val mid = "313033"
      val partB = "3e20546a2045540a656e6473747265616d0a656e646f626a0a362030206f626a203c3c202f4c656e67746820313435202f46696c746572202f466c6174654465636f6465203e3e0a73747265616d0a78da5d4ebb0ec3200cdcf90afe20986468a488a555a56c95f205c43829432122f4ffc3ab4b6fb075be3b9dbbfbfc989d8dbc7b058f0b45be5967029dfe1b90f84abb750c243716636365e2471f0cea05bda1f3d04841bb9dd82412149f9e098a91337fbaaca975c3b70ec50dc92dc4705385c9ccfa7128d9e6825fa65580e873455a63c92656dd55cfa5f9c10b58c545020a656e6473747265616d0a656e646f626a0a2525454f46"
      val dd = lpad(pmod(col("doc_id"), lit(100L)).cast("string"), 2, "0")
      val cid = concat(lit(partA), hex(substring(dd, 1, 1)), lit(mid),
        hex(substring(dd, 2, 1)), lit(partB))
      val m = pmod(col("doc_id"), lit(2L))
      val hexStr = when(m === 0, cid).otherwise(hex(lit("junk")))
      val fixture = t(s, dir, "documents")
        .select(col("doc_id"), unhex(hexStr).as("payload")).localCheckpoint()
      fixture.select(col("doc_id"),
          Multimodal.pdfText(col("payload")).as("__p"))
        .select(col("doc_id"), col("__p.text").as("pdf_text"),
          col("__p.n_streams").as("n_streams"),
          col("__p.n_decoded").as("n_decoded"))
        .orderBy("doc_id")
    }),
    "q329_pdf_cid" -> ((s, dir) => {
      val partA = "255044462d312e340a312030206f626a203c3c202f54797065202f436174616c6f67202f5061676573203220302052203e3e0a656e646f626a0a322030206f626a203c3c202f54797065202f5061676573202f4b696473205b33203020525d202f436f756e742031203e3e0a656e646f626a0a332030206f626a203c3c202f54797065202f50616765202f506172656e74203220302052202f5265736f7572636573203c3c202f466f6e74203c3c202f4631203520302052203e3e203e3e202f436f6e74656e7473203420302052203e3e0a656e646f626a0a342030206f626a203c3c202f4c656e677468203433203e3e0a73747265616d0a4254202f4631203132205466203c30303031303030323e20546a203c313033"
      val mid = "313033"
      val partB = "3e20546a2045540a656e6473747265616d0a656e646f626a0a352030206f626a203c3c202f54797065202f466f6e74202f53756274797065202f5479706530202f42617365466f6e74202f4772616674434944202f546f556e69636f6465203620302052203e3e0a656e646f626a0a362030206f626a203c3c202f4c656e67746820313435202f46696c746572202f466c6174654465636f6465203e3e0a73747265616d0a78da5d4ebb0ec3200cdcf90afe20986468a488a555a56c95f205c43829432122f4ffc3ab4b6fb075be3b9dbbfbfc989d8dbc7b058f0b45be5967029dfe1b90f84abb750c243716636365e2471f0cea05bda1f3d04841bb9dd82412149f9e098a91337fbaaca975c3b70ec50dc92dc4705385c9ccfa7128d9e6825fa65580e873455a63c92656dd55cfa5f9c10b58c545020a656e6473747265616d0a656e646f626a0a2525454f46"
      val dd = lpad(pmod(col("doc_id"), lit(100L)).cast("string"), 2, "0")
      val cid = concat(lit(partA), hex(substring(dd, 1, 1)), lit(mid),
        hex(substring(dd, 2, 1)), lit(partB))
      val plain = concat(
        hex(lit("%PDF-1.4\n1 0 obj << /Length 18 >>\nstream\nBT (Plain ")),
        hex(pmod(col("doc_id"), lit(7L)).cast("string")),
        hex(lit(") Tj ET\nendstream\nendobj\n%%EOF")))
      val m = pmod(col("doc_id"), lit(3L))
      val hexStr = when(m === 0, cid).when(m === 1, plain)
        .otherwise(hex(lit("junk")))
      val fixture = t(s, dir, "documents")
        .select(col("doc_id"), unhex(hexStr).as("payload")).localCheckpoint()
      fixture.select(col("doc_id"),
          Multimodal.pdfText(col("payload")).as("__p"))
        .select(col("doc_id"), col("__p.text").as("pdf_text"),
          col("__p.n_streams").as("n_streams"),
          col("__p.n_decoded").as("n_decoded"))
        .orderBy("doc_id")
    }),
    // WAV LIST/INFO tags: engine-built files (fmt + LIST/INFO with an
    // odd-length NUL-terminated IART value exercising RIFF padding +
    // data); untagged docs no rows, junk docs one null audit row.
    // Fixture assembly is a FLAT 5-piece hex concat: the dynamic
    // fields are fixed-width (3-digit track, 1-digit artist mod), so
    // every chunk length is a plan-time Scala constant — the previous
    // nested length-dependent expression tree was a ~2 s
    // planning/codegen constant (the q278 class)
    "q328_wav_info" -> ((s, dir) => {
      def ccHex(t: String) =
        t.getBytes("US-ASCII").map("%02x".format(_)).mkString
      def le32(v: Int) = "%02x%02x%02x%02x".format(v & 0xff,
        (v >> 8) & 0xff, (v >> 16) & 0xff, (v >> 24) & 0xff)
      val fmt = ccHex("fmt ") + le32(16) +
        "0100010044ac000088580100" + "01000800"
      val data = ccHex("data") + le32(4) + "00000000"
      // INAM body "Track NNN\0" = 10 bytes (even, no pad); IART body
      // "Artist N\0" = 9 bytes (odd -> one RIFF pad byte)
      val inamPre = ccHex("INAM") + le32(10) + ccHex("Track ")
      val iartPre = "00" + ccHex("IART") + le32(9) + ccHex("Artist ")
      val iartPost = "00" + "00" // value NUL + RIFF pad
      val infoLen = 4 + 18 + 18 // "INFO" + INAM chunk + padded IART
      val listHex = ccHex("LIST") + le32(infoLen) + ccHex("INFO")
      val riffTagged =
        ccHex("RIFF") + le32(4 + 24 + 8 + infoLen + 12) + ccHex("WAVE")
      val riffUntagged = ccHex("RIFF") + le32(4 + 24 + 12) + ccHex("WAVE")
      val trackHex =
        hex(lpad(pmod(col("doc_id"), lit(1000L)).cast("string"), 3, "0"))
      val artistHex = hex(pmod(col("doc_id"), lit(5L)).cast("string"))
      val tagged = concat(lit(riffTagged + fmt + listHex + inamPre),
        trackHex, lit(iartPre), artistHex, lit(iartPost + data))
      val m = pmod(col("doc_id"), lit(3L))
      val hexStr = when(m === 0, tagged)
        .when(m === 1, lit(riffUntagged + fmt + data))
        .otherwise(hex(lit("junk")))
      val payload = unhex(hexStr)
      val fixture = t(s, dir, "documents")
        .select(col("doc_id"), payload.as("payload")).localCheckpoint()
      val tpe = "struct<key:string,value:string>"
      fixture.select(col("doc_id"),
          posexplode(coalesce(
            graft.functions.WavInfoTags(col("payload"), 4096)
              .cast(s"array<$tpe>"),
            array(lit(null).cast(tpe)))).as(Seq("pos", "__t")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          col("__t.key").as("key"), col("__t.value").as("value"))
        .orderBy("doc_id", "pos")
    }),
    // FLAC Vorbis comments: engine-built files (STREAMINFO + a
    // VORBIS_COMMENT with mixed-case keys and a no-equals comment
    // that is skipped); untagged docs no rows, junk docs one null
    // audit row
    "q327_flac_tags" -> ((s, dir) => {
      def leHex(c: Column, nBytes: Int) = concat((0 until nBytes).map(i =>
        lpad(hex(shiftright(c, 8 * i).bitwiseAND(255L)), 2, "0")): _*)
      def comment(body: Column) =
        concat(unhex(leHex(length(body.cast("binary")).cast("long"), 4)),
          body.cast("binary"))
      val id = col("doc_id").cast("string")
      val vendor = "graft"
      val vc = concat(
        unhex(lit("%02X000000".format(vendor.length))),
        lit(vendor).cast("binary"),
        unhex(lit("04000000")),
        comment(concat(lit("TITLE=Song "), id)),
        comment(concat(lit("artist=Artist "),
          pmod(col("doc_id"), lit(7L)).cast("string"))),
        comment(lit("no equals here")),
        comment(lit("Album=A&B")))
      val streaminfo = "00" + "000022" + ("00" * 34)
      val tagged = concat(unhex(lit("664c6143" + streaminfo)),
        unhex(lit("84")),
        unhex(lpad(hex(length(vc).cast("long")), 6, "0")), vc)
      val untagged = lit(("664c6143" + "80" + "000022" + ("00" * 34))
        .grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
      val m = pmod(col("doc_id"), lit(3L))
      val payload = when(m === 0, tagged).when(m === 1, untagged)
        .otherwise(lit("junk".getBytes("UTF-8")))
      val fixture = t(s, dir, "documents")
        .select(col("doc_id"), payload.as("payload")).localCheckpoint()
      val tpe = "struct<key:string,value:string>"
      fixture.select(col("doc_id"),
          posexplode(coalesce(
            graft.functions.FlacTags(col("payload")).cast(s"array<$tpe>"),
            array(lit(null).cast(tpe)))).as(Seq("pos", "__t")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          col("__t.key").as("key"), col("__t.value").as("value"))
        .orderBy("doc_id", "pos")
    }),
    // TIFF dHash via the imageDhash dispatcher: pinned uncompressed
    // gray TIFFs of the q320 pattern in BOTH photometric polarities —
    // both must equal the GIF/PNG hash constant; junk docs null
    // compressed-TIFF dHash: LZW (early-change codes), PackBits and
    // Deflate+Predictor2 re-encodings of the q326 grid (committed
    // tool tools/make_tiff_compressed_fixture.py, whose independent
    // python dHash asserts the same pinned constant); junk docs null
    "q336_tiff_compressed" -> ((s, dir) => {
      val lzw = "49492a000a010000800001a1a138d0824e2d9a0ea8247a7152b66181c2821170ec9055311bcf8894b28d60bd0103836281a9089e5c349d906904eaa96ec404854442f1e124ac63381f51497522c57c0308070523621940ba6a3ba11229e55ae18a0a0b88c603d2515cc8713f22d30a5592fc08110f0a86e4428978d67842a493eac5cb181618128c47c4b2c194e47f462654cb360014241f160e08a522f9b0f28649a815aba638303226198fc9859331cd008d4d29d68c10304c402d1d118a660369e90e9450ab97702824189a5a339d1028e4daa16ac2894522c54309b8f6884aa895ebc00c8a492684c2e1b0f6182265349b466371d8f8081f42a251a532b96cbc1216a9552ad01000090000010300010000001000000001010300010000001000000002010300010000000800000003010300010000000500000006010300010000000100000011010400010000000800000015010300010000000100000016010300010000001000000017010400010000000101000000000000"
      val pb = "49492a000a0100007f000d1a2734414e5b6875828f9ca9b6c30714212e3b4855626f7c8996a3b0bd020e1b2835424f5c697683909daab7c40915222f3c495663707d8a97a4b1be03101c293643505d6a7784919eabb8c50a1723303d4a5764717e8b98a5b2bf04111e2a3744515e6b7885929facb9c60b1825313e4b5865727f8c99a6b3c005121f2c7f3845525f6c798693a0adbac70c1926333f4c596673808d9aa7b4c10613202d3a4653606d7a8794a1aebb000d1a2734414d5a6774818e9ba8b5c20714212e3b4854616e7b8895a2afbc010e1b2835424f5b6875828f9ca9b6c30815222f3c4956626f7c8996a3b0bd020f1c293643505d697683909daab7c4091623303d4a5764090000010300010000001000000001010300010000001000000002010300010000000800000003010300010000000580000006010300010000000100000011010400010000000800000015010300010000000100000016010300010000001000000017010400010000000201000000000000"
      val dp = "49492a0046000000789c63e04505eca85c573e34be282a9757068daf8ccae5d542e31ba272792dd0f8f6a85c5e37542eaf2f1a3f0495cb1b8dc64f42e5f266a2f101c12012c10a0000010300010000001000000001010300010000001000000002010300010000000800000003010300010000000800000006010300010000000100000011010400010000000800000015010300010000000100000016010300010000001000000017010400010000003e0000003d010300010000000200000000000000"
      val m = pmod(col("doc_id"), lit(4L))
      val hexStr = when(m === 0, lit(lzw)).when(m === 1, lit(pb))
        .when(m === 2, lit(dp)).otherwise(hex(lit("junk")))
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.imageDhash(unhex(hexStr)).as("dhash"))
        .orderBy("doc_id")
    }),
    "q326_tiff_dhash" -> ((s, dir) => {
      val plain = "49492a0008010000000d1a2734414e5b6875828f9ca9b6c30714212e3b4855626f7c8996a3b0bd020e1b2835424f5c697683909daab7c40915222f3c495663707d8a97a4b1be03101c293643505d6a7784919eabb8c50a1723303d4a5764717e8b98a5b2bf04111e2a3744515e6b7885929facb9c60b1825313e4b5865727f8c99a6b3c005121f2c3845525f6c798693a0adbac70c1926333f4c596673808d9aa7b4c10613202d3a4653606d7a8794a1aebb000d1a2734414d5a6774818e9ba8b5c20714212e3b4854616e7b8895a2afbc010e1b2835424f5b6875828f9ca9b6c30815222f3c4956626f7c8996a3b0bd020f1c293643505d697683909daab7c4091623303d4a5764090000010300010000001000000001010300010000001000000002010300010000000800000003010300010000000100000006010300010000000100000011010400010000000800000015010300010000000100000016010300010000001000000017010400010000000001000000000000"
      val inverted = "49492a0008010000fff2e5d8cbbeb1a4978a7d706356493cf8ebded1c4b7aa9d908376695c4f42fdf1e4d7cabdb0a396897c6f6255483bf6eaddd0c3b6a99c8f8275685b4e41fcefe3d6c9bcafa295887b6e6154473af5e8dccfc2b5a89b8e8174675a4d40fbeee1d5c8bbaea194877a6d60534639f4e7dacec1b4a79a8d807366594c3ffaede0d3c7baada09386796c5f524538f3e6d9ccc0b3a6998c7f7265584b3ef9ecdfd2c5b9ac9f9285786b5e5144fff2e5d8cbbeb2a5988b7e7164574a3df8ebded1c4b7ab9e9184776a5d5043fef1e4d7cabdb0a4978a7d706356493cf7eaddd0c3b6a99d908376695c4f42fdf0e3d6c9bcafa296897c6f6255483bf6e9dccfc2b5a89b090000010300010000001000000001010300010000001000000002010300010000000800000003010300010000000100000006010300010000000000000011010400010000000800000015010300010000000100000016010300010000001000000017010400010000000001000000000000"
      val m = pmod(col("doc_id"), lit(3L))
      val hexStr = when(m === 0, lit(plain)).when(m === 1, lit(inverted))
        .otherwise(hex(lit("junk")))
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.imageDhash(unhex(hexStr)).as("dhash"))
        .orderBy("doc_id")
    }),
    // ICO favicon census: a pinned 2-image icon (classic BMP entry +
    // an embedded-PNG 256px entry via the zero-byte rule); junk docs
    // keep one null audit row
    "q325_ico_entries" -> ((s, dir) => {
      val ico = "000001000200" +
        "10100000010004000800000026000000" +
        "00000000010020000c0000002e000000" +
        "0011223344556677" +
        "89504e470d0a1a0a00000000"
      val m = pmod(col("doc_id"), lit(2L))
      val hexStr = when(m === 0, lit(ico)).otherwise(hex(lit("junk")))
      val tpe = "struct<width:int,height:int,bpp:int,size:bigint," +
        "is_png:boolean>"
      t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(coalesce(
            graft.functions.IcoEntries(unhex(hexStr)).cast(s"array<$tpe>"),
            array(lit(null).cast(tpe)))).as(Seq("entry_idx", "__e")))
        .select(col("doc_id"), col("entry_idx").cast("long").as("entry_idx"),
          col("__e.width").as("width"), col("__e.height").as("height"),
          col("__e.bpp").as("bpp"), col("__e.size").as("size"),
          col("__e.is_png").as("is_png"))
        .orderBy("doc_id", "entry_idx")
    }),
    // WebP animation census: a pinned 3-frame VP8X+ANIM+ANMF file vs
    // a static VP8L; junk docs null
    "q324_webp_frames" -> ((s, dir) => {
      val ani = "524946467800000057454250565038580a000000020000000f00000f0000414e494d06000000000000000200414e4d46130000000000000000000f00000f0000280000002f000000414e4d46130000000000000000000f00000f00003c0000002f000000414e4d46130000000000000000000f00000f0000640000002f000000"
      val sta = "5249464612000000574542505650384c060000002f0f000f0000"
      val m = pmod(col("doc_id"), lit(3L))
      val hexStr = when(m === 0, lit(ani)).when(m === 1, lit(sta))
        .otherwise(hex(lit("junk")))
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.webpFrames(unhex(hexStr)).as("__w"))
        .select(col("doc_id"), col("__w.n_frames").as("n_frames"),
          col("__w.total_duration_ms").as("total_duration_ms"),
          col("__w.loop_count").as("loop_count"),
          col("__w.variant").as("variant"))
        .orderBy("doc_id")
    }),
    // GIF animation census: a pinned 2-frame NETSCAPE-looped GIF vs
    // the static q320 image; junk docs null
    "q322_gif_frames" -> ((s, dir) => {
      val palette = (0 until 256).map(i => "%02x".format(i) * 3).mkString
      val aniHead = "47494638396104000400f70000"
      val aniTail = "21ff0b4e45545343415045322e30030103000021f904000a0000002c0000000004000400000815000134d070e20085102e1c6c4051a38288173c02020021f90400190000002c0000000004000400000815000338d880024105112f1e704861c3c208183d0202003b"
      val staHead = "47494638396110001000f70000"
      val staTail = "2c00000000100010000008ff000134d070824610275bd0d411f488532a5bc30e5008e16207922a62def049646914ac5e021c6c405143c8132e69ec0c82d449d52d62092a8878c12389953170fa28ba442a96af011038a4b031044a1735770845f2b40a5731051746c0e8a1e40a99387e16612a25eb1781081e54dc2012c5cb1a3c85247d6295cbd8020c2562f85882a58c9c3f8c32999a05ac80840f2c701491f2854d1e439340b5d2758c410613337e30c962660ea0469a4ed10a66600288163a8c4c01d346cf214aa15ced02d040c3091a419a6839432790a34da86a093b4021848b1d48a88471b307512551af780570b001450d214fb6a0a923e811a754b68621a820e2058f2456c4bc24e193c8d22858bd043ce090c2c610285dd2d81904a993aa5bc412581801a387922b640404003b"
      val m = pmod(col("doc_id"), lit(3L))
      val hexStr = when(m === 0, lit(aniHead + palette + aniTail))
        .when(m === 1, lit(staHead + palette + staTail))
        .otherwise(hex(lit("junk")))
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.gifFrames(unhex(hexStr)).as("__g"))
        .select(col("doc_id"), col("__g.n_frames").as("n_frames"),
          col("__g.total_delay_cs").as("total_delay_cs"),
          col("__g.loop_count").as("loop_count"),
          col("__g.version").as("version"))
        .orderBy("doc_id")
    }),
    // XLSX sheet names: workbook.xml tab order resolved through the
    // rels member to worksheet files (tab order deliberately differs
    // from the fileN numbering); an unresolvable r:id keeps a null
    // sheet_file; corrupt docs contribute no rows
    "q323_xlsx_sheets" -> ((s, dir) => {
      def leHex(c: Column, nBytes: Int) = concat((0 until nBytes).map(i =>
        lpad(hex(shiftright(c, 8 * i).bitwiseAND(255L)), 2, "0")): _*)
      def member(name: String, body: Column) = {
        val bb = body.cast("binary")
        val bl = length(bb).cast("long")
        concat(unhex(concat(lit("504B0304140000000000" + "00000000"),
          leHex(crc32(bb), 4), leHex(bl, 4), leHex(bl, 4),
          lit("%02X000000".format(name.length)))),
          lit(name).cast("binary"), bb)
      }
      val wb = concat(
        lit("<workbook><sheets>" +
          "<sheet name=\"Data &amp; more\" sheetId=\"1\" r:id=\"rId2\"/>" +
          "<sheet name=\"S"),
        pmod(col("doc_id"), lit(7L)).cast("string"),
        lit("\" sheetId=\"2\" r:id=\"rId1\"/>" +
          "<sheet name=\"Ghost\" sheetId=\"3\" r:id=\"rId9\"/>" +
          "</sheets></workbook>"))
      val rels = lit("<Relationships>" +
        "<Relationship Id=\"rId1\" Target=\"worksheets/sheet1.xml\"/>" +
        "<Relationship Id=\"rId2\" Target=\"worksheets/sheet2.xml\"/>" +
        "</Relationships>")
      val payload = when(pmod(col("doc_id"), lit(5L)) === 0,
        lit("junk".getBytes("UTF-8")))
        .otherwise(concat(member("xl/workbook.xml", wb),
          member("xl/_rels/workbook.xml.rels", rels)))
      val fixture = t(s, dir, "documents")
        .select(col("doc_id"), payload.as("payload")).localCheckpoint()
      Multimodal.xlsxSheets(fixture).orderBy("doc_id", "pos")
    }),
    // GIF perceptual dHash via the imageDhash dispatcher: two pinned
    // hand-LZW 16x16 grayscale GIFs (tools/make_gif_fixture.py, the
    // expected hashes computed INDEPENDENTLY in python); every 3rd
    // doc is junk -> null
    "q320_gif_dhash" -> ((s, dir) => {
      val head = "47494638396110001000f70000"
      val palette = (0 until 256).map(i => "%02x".format(i) * 3).mkString
      val tailA = "2c00000000100010000008ff000134d070824610275bd0d411f488532a5bc30e5008e16207922a62def049646914ac5e021c6c405143c8132e69ec0c82d449d52d62092a8878c12389953170fa28ba442a96af011038a4b031044a1735770845f2b40a5731051746c0e8a1e40a99387e16612a25eb1781081e54dc2012c5cb1a3c85247d6295cbd8020c2562f85882a58c9c3f8c32999a05ac80840f2c701491f2854d1e439340b5d2758c410613337e30c962660ea0469a4ed10a66600288163a8c4c01d346cf214aa15ced02d040c3091a419a6839432790a34da86a093b4021848b1d48a88471b307512551af780570b001450d214fb6a0a923e811a754b68621a820e2058f2456c4bc24e193c8d22858bd043ce090c2c610285dd2d81904a993aa5bc412581801a387922b640404003b"
      val tailB = "2c00000000100010000008ff003ff0c86267122c0e39accc81d42a838d297044fce092c792800f3cb2d899048b430e2b734a08f9c2275301113fb8e4b124e0038f2c76501411f38713821242bef0c95440c40f2e7956202923e8d3021445c4fce184a084902f7c5c2c41534894831548ca08fab4004511317f62385983a85404174bd01412e56005923282684471b3081585184ed6202a15c1c51234856e5089e368d5051a51dc2c42452186933588745ca113c995861b54e2385a75814614378b7a68b9430940071d57e84472a5e10695388e8074d1736900881e5aee5002d041c7153a918680e9a3c9c008205df45c1a00a287963b948c8c01d42981892160fa6832300248173d9792982419048a410a236300754a606208983e9a98a43134ea018b246606816290c2c818409d0404003b"
      // the PALETTE PNG of pattern A (color type 3, PLTE = the same
      // 256-gray table): its hash must EQUAL the gifA hash — the
      // cross-format contract oracle-visible
      val pngPre = "89504e470d0a1a0a0000000d49484452000000100000001008" +
        "03000000282d0f5300000300504c5445"
      val pngPost = "e2b05d7d000000f449444154789c6360e095523771f48bce286dea9fb372db61067611453d6b8fd0a4fc9ace698b37ec6562e093d63075f28fc92c6b9e3077d5f6239c0ca24afa369e61c905b55dd3976cdcc72cc020a369e61c109b55de3271deea1d47b9c419940d6cbdc2530aebba672cddb49f45508e41cbdc25302ebba275d2fc353b8f714ba83218da7947a416d5f7cc5cb6f900ab90bc0e83856b507c4e65dbe4056b771de791543366b0f7894c2b6ee89db57ccb413661055d2b06b7e084dcaaf6290bd7ed86b899c1372abda4b16ff68aad87206e660849ccabee98ba68fd1e46889b19e0bee280b89901ee2b7e889b19e0be1283b819009d1d61a93989a2770000000049454e44ae426082"
      val m = pmod(col("doc_id"), lit(4L))
      val hexStr = when(m === 0, lit(head + palette + tailA))
        .when(m === 1, lit(head + palette + tailB))
        .when(m === 2, lit(pngPre + palette + pngPost))
        .otherwise(hex(lit("junk")))
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.imageDhash(unhex(hexStr)).as("dhash"))
        .orderBy("doc_id")
    }),
    // MP3 duration: engine-built MPEG1-L3 payloads — Xing exact
    // counts, CBR floor arithmetic, VBRI at the FhG offset; every
    // 4th doc is junk -> null audit fields
    "q319_mp3_duration" -> ((s, dir) => {
      val m = pmod(col("doc_id"), lit(4L))
      // 128 kbps 44.1 kHz stereo first frame = FFFB9000
      val xingFrames = lit(1000L) + pmod(col("doc_id"), lit(50L))
      val xing = concat(lit("FFFB9000"), lit("00" * 32), hex(lit("Xing")),
        lit("00000001"), lpad(hex(xingFrames), 8, "0"))
      // CBR: frame_size 417; 417*(1+id%8)+13 payload bytes after the
      // 4-byte header -> exactly 1+id%8 whole frames
      val cbrK = lit(1L) + pmod(col("doc_id"), lit(8L))
      val cbr = concat(lit("FFFB9000"),
        call_function("repeat", lit("00"), (cbrK * 417L + 13L).cast("int")))
      val vbriFrames = pmod(col("doc_id"), lit(100L))
      val vbri = concat(lit("FFFB9000"), lit("00" * 32), hex(lit("VBRI")),
        lit("00" * 10), lpad(hex(vbriFrames), 8, "0"))
      val hexStr = when(m === 0, xing).when(m === 1, cbr)
        .when(m === 2, vbri).otherwise(hex(lit("junk")))
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.mp3Duration(unhex(hexStr)).as("__d"))
        .select(col("doc_id"), col("__d.frames").as("frames"),
          col("__d.duration_ms").as("duration_ms"),
          col("__d.method").as("method"))
        .orderBy("doc_id")
    }),
    // ODS cell GRID: engine-built stored-zip packages whose
    // content.xml exercises typed + text values, column/row repeats,
    // covered cells and an empty table in the sheet numbering; every
    // 4th doc is junk -> one null audit row
    "q318_ods_cells" -> ((s, dir) => {
      def leHex(c: Column, nBytes: Int) = concat((0 until nBytes).map(i =>
        lpad(hex(shiftright(c, 8 * i).bitwiseAND(255L)), 2, "0")): _*)
      def member(name: String, body: Column) = {
        val bb = body.cast("binary")
        val bl = length(bb).cast("long")
        concat(unhex(concat(lit("504B0304140000000000" + "00000000"),
          leHex(crc32(bb), 4), leHex(bl, 4), leHex(bl, 4),
          lit("%02X000000".format(name.length)))),
          lit(name).cast("binary"), bb)
      }
      val id = col("doc_id").cast("string")
      val content = concat(
        lit("<office:document-content><office:body><office:spreadsheet>" +
          "<table:table table:name=\"S1\"><table:table-row>" +
          "<table:table-cell office:value-type=\"string\"><text:p>alpha "),
        id,
        lit("</text:p></table:table-cell>" +
          "<table:table-cell table:number-columns-repeated=\"2\" " +
          "office:value=\"7\"><text:p>7</text:p></table:table-cell>" +
          "<table:table-cell/>" +
          "<table:table-cell><text:p>end &amp; " +
          "<text:span>fin</text:span></text:p></table:table-cell>" +
          "</table:table-row>" +
          "<table:table-row table:number-rows-repeated=\"2\">" +
          "<table:covered-table-cell/><table:table-cell office:value=\""),
        pmod(col("doc_id"), lit(9L)).cast("string"),
        lit("\"/></table:table-row></table:table>" +
          "<table:table/>" +
          "<table:table><table:table-row><table:table-cell>" +
          "<text:p>s2</text:p></table:table-cell></table:table-row>" +
          "</table:table>" +
          "</office:spreadsheet></office:body></office:document-content>"))
      val payload = when(pmod(col("doc_id"), lit(4L)) === 3,
        lit("junk".getBytes("UTF-8")))
        .otherwise(member("content.xml", content))
      val fixture = t(s, dir, "documents")
        .select(col("doc_id"), payload.as("payload")).localCheckpoint()
      val tpe = "struct<sheet:bigint,row:bigint,col:bigint,value:string>"
      fixture.select(col("doc_id"),
          explode(coalesce(
            graft.functions.OdsCells(graft.functions.ZipEntryBytes(
              col("payload"), "content.xml", 1 << 24)).cast(s"array<$tpe>"),
            array(lit(null).cast(tpe)))).as("__c"))
        .select(col("doc_id"), col("__c.sheet").as("sheet"),
          col("__c.row").as("row"), col("__c.col").as("col"),
          col("__c.value").as("value"))
        .orderBy("doc_id", "sheet", "row", "col")
    }),
    // 7z member EXTRACTION over the same pinned archive as q316: the
    // LZMA2 folders decode through the engine's own machinery, member
    // text surfaces; the CRC-flip branch keeps one null audit row
    "q317_7z_members" -> ((s, dir) => {
      val sz = "377abcaf271c000265c6166e2a000000000000006a0000000000" +
        "00005acb4dcc0100117072696e74282768656c6c6f20377a27290a000100" +
        "0f726561646d65207465787420626f64790001040600020916140a019dd7" +
        "fedb4942a7c600070b0200012121011601212101160c12100a0106091137" +
        "abba22830008000005030e0180112f0073007200630000007300720063002f" +
        "006d00610069006e002e0070007900000052004500410044004d0045000000" +
        "0000"
      val corrupt = sz.substring(0, 56) +
        "%02x".format(Integer.parseInt(sz.substring(56, 58), 16) ^ 1) +
        sz.substring(58)
      val m = pmod(col("doc_id"), lit(2L))
      val hexStr = when(m === 0, lit(sz)).otherwise(lit(corrupt))
      val tpe = "struct<name:string,size:bigint,is_dir:boolean,data:binary>"
      t(s, dir, "documents")
        .select(col("doc_id"),
          explode(coalesce(
            graft.functions.SevenZipMembers(unhex(hexStr))
              .cast(s"array<$tpe>"),
            array(lit(null).cast(tpe)))).as("__e"))
        .select(col("doc_id"), col("__e.name").as("name"),
          col("__e.size").as("size"), col("__e.is_dir").as("is_dir"),
          graft.functions.Utf8Text(col("__e.data")).as("text"))
        .orderBy("doc_id", "name")
    }),
    "q316_7z_list" -> ((s, dir) => {
      val sz = "377abcaf271c000265c6166e2a000000000000006a0000000000" +
        "00005acb4dcc0100117072696e74282768656c6c6f20377a27290a000100" +
        "0f726561646d65207465787420626f64790001040600020916140a019dd7" +
        "fedb4942a7c600070b0200012121011601212101160c12100a0106091137" +
        "abba22830008000005030e0180112f0073007200630000007300720063002f" +
        "006d00610069006e002e0070007900000052004500410044004d0045000000" +
        "0000"
      // byte 28 = low byte of the next-header CRC
      val corrupt = sz.substring(0, 56) +
        "%02x".format(Integer.parseInt(sz.substring(56, 58), 16) ^ 1) +
        sz.substring(58)
      val m = pmod(col("doc_id"), lit(2L))
      val hexStr = when(m === 0, lit(sz)).otherwise(lit(corrupt))
      val tpe = "struct<name:string,size:bigint,is_dir:boolean>"
      t(s, dir, "documents")
        .select(col("doc_id"),
          explode(coalesce(
            graft.functions.SevenZipList(unhex(hexStr))
              .cast(s"array<$tpe>"),
            array(lit(null).cast(tpe)))).as("__e"))
        .select(col("doc_id"), col("__e.name").as("name"),
          col("__e.size").as("size"), col("__e.is_dir").as("is_dir"))
        .orderBy("doc_id", "name")
    }),
    // OpenDocument text — pinned stored-zip ODF packages (odt with a
    // heading, a nested span, an entity; ods with table cells); the
    // corrupt branch (broken zip magic) keeps a null audit row
    "q315_odf_text" -> ((s, dir) => {
      val odt =
        "504b0304140000000000c021105d5ec6320c2700000027000000080000006d696d65747970656170706c6963" +
        "6174696f6e2f766e642e6f617369732e6f70656e646f63756d656e742e74657874504b0304140000000000c0" +
        "21105ded37c98b0b0000000b000000150000004d4554412d494e462f6d616e69666573742e786d6c3c6d616e" +
        "69666573742f3e504b0304140000000000c021105d58f4dc4735010000350100000b000000636f6e74656e74" +
        "2e786d6c3c3f786d6c2076657273696f6e3d22312e30223f3e3c6f66666963653a646f63756d656e742d636f" +
        "6e74656e743e3c6f66666963653a626f64793e3c6f66666963653a746578743e3c746578743a682074657874" +
        "3a6f75746c696e652d6c6576656c3d2231223e54697472652026616d703b20706c75733c2f746578743a683e" +
        "3c746578743a703e4669727374207061722077697468203c746578743a7370616e20746578743a7374796c65" +
        "2d6e616d653d225431223e6e657374656420c3bc3c2f746578743a7370616e3e2072756e2e3c2f746578743a" +
        "703e3c746578743a702f3e3c746578743a703e5365636f6e64207061722e3c2f746578743a703e3c2f6f6666" +
        "6963653a746578743e3c2f6f66666963653a626f64793e3c2f6f66666963653a646f63756d656e742d636f6e" +
        "74656e743e504b01021403140000000000c021105d5ec6320c27000000270000000800000000000000000000" +
        "008001000000006d696d6574797065504b01021403140000000000c021105ded37c98b0b0000000b00000015" +
        "000000000000000000000080014d0000004d4554412d494e462f6d616e69666573742e786d6c504b01021403" +
        "140000000000c021105d58f4dc4735010000350100000b000000000000000000000080018b000000636f6e74" +
        "656e742e786d6c504b05060000000003000300b2000000e90100000000"
      val ods =
        "504b0304140000000000c021105d856c398a2e0000002e000000080000006d696d65747970656170706c6963" +
        "6174696f6e2f766e642e6f617369732e6f70656e646f63756d656e742e7370726561647368656574504b0304" +
        "140000000000c021105ded37c98b0b0000000b000000150000004d4554412d494e462f6d616e69666573742e" +
        "786d6c3c6d616e69666573742f3e504b0304140000000000c021105dbe541d3f61010000610100000b000000" +
        "636f6e74656e742e786d6c3c3f786d6c2076657273696f6e3d22312e30223f3e3c6f66666963653a646f6375" +
        "6d656e742d636f6e74656e743e3c6f66666963653a626f64793e3c6f66666963653a73707265616473686565" +
        "743e3c7461626c653a7461626c65207461626c653a6e616d653d225331223e3c7461626c653a7461626c652d" +
        "726f773e3c7461626c653a7461626c652d63656c6c3e3c746578743a703e63656c6c2041313c2f746578743a" +
        "703e3c2f7461626c653a7461626c652d63656c6c3e3c7461626c653a7461626c652d63656c6c206f66666963" +
        "653a76616c75653d223432223e3c746578743a703e34323c2f746578743a703e3c2f7461626c653a7461626c" +
        "652d63656c6c3e3c2f7461626c653a7461626c652d726f773e3c2f7461626c653a7461626c653e3c2f6f6666" +
        "6963653a73707265616473686565743e3c2f6f66666963653a626f64793e3c2f6f66666963653a646f63756d" +
        "656e742d636f6e74656e743e504b01021403140000000000c021105d856c398a2e0000002e00000008000000" +
        "00000000000000008001000000006d696d6574797065504b01021403140000000000c021105ded37c98b0b00" +
        "00000b0000001500000000000000000000008001540000004d4554412d494e462f6d616e69666573742e786d" +
        "6c504b01021403140000000000c021105dbe541d3f61010000610100000b0000000000000000000000800192" +
        "000000636f6e74656e742e786d6c504b05060000000003000300b20000001c0200000000"
      // corrupt: head magic broken AND the EOCD tail cut — the CD
      // walk refuses and the local-header fallback finds no magic
      val corrupt = ("58" + odt.drop(2)).dropRight(8)
      val m = pmod(col("doc_id"), lit(3L))
      val hexStr = when(m === 0, lit(odt)).when(m === 1, lit(ods))
        .otherwise(lit(corrupt))
      t(s, dir, "documents")
        .select(col("doc_id"),
          Multimodal.odfText(unhex(hexStr)).as("odf_text"),
          Multimodal.odfKind(unhex(hexStr)).as("odf_kind"))
        .orderBy("doc_id")
    }),
    // Arrow IPC file footer census — the pinned pyarrow feather-v2
    // file (two record batches, three columns) walked through the
    // footer flatbuffer; corrupt docs keep one null audit row
    "q314_arrow_meta" -> ((s, dir) => {
      val arrow =
        "4152524f57310000ffffffffd80000001000000000000a000c000600050008000a000000000104000c000000" +
        "0800080000000400080000000400000003000000740000003400000004000000a8ffffff0000010310000000" +
        "1800000004000000000000000100000078000600080006000600000000000200d4ffffff0000010510000000" +
        "1c0000000400000000000000040000006e616d65000000000400040004000000100014000800060007000c00" +
        "000010001000000000000102100000001c0000000400000000000000020000006964000008000c0008000700" +
        "080000000000000140000000fffffffff800000014000000000000000c0016000600050008000c000c000000" +
        "0003040018000000480000000000000000000a0018000c00040008000a0000008c0000001000000002000000" +
        "000000000000000007" +
        "00" * 27 +
        "18000000000000001800000000000000000000000000000018000000000000000c0000000000000028000000" +
        "0000000003000000000000003000000000000000000000000000000030000000000000001800000000000000" +
        "0000000003000000020000000000000000000000000000000200000000000000000000000000000002000000" +
        "0000000000000000000000000100000000000000020000000000000003000000000000000000000001000000" +
        "02000000000000006162630000000000000000000000f83f00000000000004400000000000000c40ffffffff" +
        "f800000014000000000000000c0016000600050008000c000c00000000030400180000002000000000000000" +
        "00000a0018000c00040008000a0000008c0000001000000001000000000000000000000007" +
        "00" * 27 +
        "0800000000000000080000000000000000000000000000000800000000000000080000000000000010000000" +
        "0000000001000000000000001800000000000000000000000000000018000000000000000800000000000000" +
        "0000000003000000010000000000000000000000000000000100000000000000000000000000000001000000" +
        "0000000000000000000000000300000000000000000000000100000063000000000000000000000000000c40" +
        "ffffffff00000000100000000c001400060008000c0010000c000000000004004c0000003c00000004000000" +
        "02000000e8000000000000000001000000000000480000000000000030020000000000000001000000000000" +
        "2000000000000000000000000800080000000400080000000400000003000000740000003400000004000000" +
        "a8ffffff00000103100000001800000004000000000000000100000078000600080006000600000000000200" +
        "d4ffffff00000105100000001c0000000400000000000000040000006e616d65000000000400040004000000" +
        "100014000800060007000c00000010001000000000000102100000001c000000040000000000000002000000" +
        "6964000008000c0008000700080000000000000140000000180100004152524f5731"
      val corrupt = "58" + arrow.drop(2)
      val m = pmod(col("doc_id"), lit(2L))
      val hexStr = when(m === 0, lit(arrow)).otherwise(lit(corrupt))
      t(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.ArrowFooterMeta(unhex(hexStr)).as("__m"))
        .select(col("doc_id"), col("__m.version").as("version"),
          col("__m.n_dictionaries").as("n_dictionaries"),
          col("__m.n_record_batches").as("n_record_batches"),
          col("__m.total_body_bytes").as("total_body_bytes"),
          when(col("__m").isNotNull,
            array_join(col("__m.columns"), ";")).as("cols"))
        .orderBy("doc_id")
    }),
    // CBOR sequence decoding — a pinned RFC 8949 sequence: a definite
    // map, an indefinite-everything map (text chunks, nested
    // indefinite array), a tagged epoch int unwrapped; corrupt docs
    // (stray break) keep one null audit row
    "q313_cbor" -> ((s, dir) => {
      // {"a":1,"b":[2,3]} ++ indef {"tx":[4,5],"k":"ab"} ++ tag1(int)
      val seqHex = "a26161016162820203" +
        "bf" + "627478" + "9f0405ff" + "616b" + "7f626162ff" + "ff" +
        "c11a514b67b0"
      val corrupt = "ff" + seqHex
      val m = pmod(col("doc_id"), lit(2L))
      val hexStr = when(m === 0, lit(seqHex)).otherwise(lit(corrupt))
      t(s, dir, "documents")
        .select(col("doc_id"),
          explode(coalesce(
            graft.functions.CborRecords(unhex(hexStr))
              .cast("array<string>"),
            array(lit(null).cast("string")))).as("rec"))
        .orderBy("doc_id", "rec")
    }),
    // ORC file-level column statistics — the pinned pyarrow files'
    // per-column value counts / hasNull / typed min-max off the
    // footer's ColumnStatistics; corrupt docs keep one null audit row
    "q312_orc_column_stats" -> ((s, dir) => {
      val corrupt = "58" + orcPlainHex.drop(2)
      val m = pmod(col("doc_id"), lit(3L))
      val hexStr = when(m === 0, lit(orcPlainHex))
        .when(m === 1, lit(orcZlibHex)).otherwise(lit(corrupt))
      val tpe = "struct<column:int,n_values:bigint,has_null:boolean," +
        "int_min:bigint,int_max:bigint,int_sum:bigint," +
        "double_min:double,double_max:double,str_min:string," +
        "str_max:string>"
      t(s, dir, "documents")
        .select(col("doc_id"),
          explode(coalesce(
            graft.functions.OrcColumnStats(unhex(hexStr))
              .cast(s"array<$tpe>"),
            array(lit(null).cast(tpe)))).as("__c"))
        .select(col("doc_id"), col("__c.column").as("column"),
          col("__c.n_values").as("n_values"),
          col("__c.has_null").as("has_null"),
          col("__c.int_min").as("int_min"),
          col("__c.int_max").as("int_max"),
          col("__c.str_min").as("str_min"),
          col("__c.str_max").as("str_max"))
        .orderBy("doc_id", "column")
    }),
    // generic protobuf wire census — schema discovery for unknown
    // .pb payloads: a pinned wire-exact message with repeats, a
    // nested descent, the string-vs-bytes heuristic; the corrupt
    // branch (deprecated group wire) keeps one null audit row
    "q311_proto_fields" -> ((s, dir) => {
      val msg = "0896011207" + "74657374696e67" +
        "1a0b0801111111111111111111" + "2522222222" + "2a02ff00" + "0807"
      val corrupt = "0b" + msg // field 1 wire 3: a group, refused
      val m = pmod(col("doc_id"), lit(2L))
      val hexStr = when(m === 0, lit(msg)).otherwise(lit(corrupt))
      val tpe = "struct<path:string,kind:string,count:bigint," +
        "total_bytes:bigint>"
      t(s, dir, "documents")
        .select(col("doc_id"),
          explode(coalesce(
            graft.functions.ProtoFields(unhex(hexStr)).cast(s"array<$tpe>"),
            array(lit(null).cast(tpe)))).as("__f"))
        .select(col("doc_id"), col("__f.path").as("path"),
          col("__f.kind").as("kind"), col("__f.count").as("count"),
          col("__f.total_bytes").as("total_bytes"))
        .orderBy("doc_id", "path", "kind")
    }),
    // MessagePack stream decoding — a pinned dump of two back-to-back
    // maps (UTF-8 string, nested array with nil); corrupt docs keep
    // one null audit row
    "q310_msgpack" -> ((s, dir) => {
      val dump = "82a16101a174a17883a16102a174a2c3bca278739201c0"
      val corrupt = dump.dropRight(2) // truncation: stream must tile
      val m = pmod(col("doc_id"), lit(2L))
      val hexStr = when(m === 0, lit(dump)).otherwise(lit(corrupt))
      t(s, dir, "documents")
        .select(col("doc_id"),
          explode(coalesce(
            graft.functions.MsgpackRecords(unhex(hexStr))
              .cast("array<string>"),
            array(lit(null).cast("string")))).as("rec"))
        .orderBy("doc_id", "rec")
    }),
    // BSON dump decoding — a pinned mongodump-shaped payload of two
    // back-to-back documents (int32, string incl. UTF-8 + an
    // ampersand, ObjectId, nested doc, array-with-double); corrupt
    // docs keep one null audit row
    "q309_bson" -> ((s, dir) => {
      val dump = "2500000010610001000000027400020000007800076964000102" +
        "030405060708090a0b0c00440000001061000200000002740007000000c3" +
        "bc2026207900037375620010000000127a0003000000000000000004617272" +
        "0010000000013000000000000000f83f0000"
      val corrupt = dump.dropRight(4) + "0100"
      val m = pmod(col("doc_id"), lit(2L))
      val hexStr = when(m === 0, lit(dump)).otherwise(lit(corrupt))
      t(s, dir, "documents")
        .select(col("doc_id"),
          explode(coalesce(
            graft.functions.BsonRecords(unhex(hexStr))
              .cast("array<string>"),
            array(lit(null).cast("string")))).as("rec"))
        .orderBy("doc_id", "rec")
    }),
    // ORC per-stripe census — the same pinned pyarrow files as q287,
    // now at stripe grain (offset/index/data/footer lengths + EXACT
    // rows per stripe, the split-planner numbers); corrupt docs keep
    // one null audit row
    "q308_orc_stripes" -> ((s, dir) => {
      val corrupt = "58" + orcPlainHex.drop(2)
      val m = pmod(col("doc_id"), lit(3L))
      val hexStr = when(m === 0, lit(orcPlainHex))
        .when(m === 1, lit(orcZstdHex)).otherwise(lit(corrupt))
      val tpe = "struct<offset:bigint,index_length:bigint," +
        "data_length:bigint,footer_length:bigint,number_of_rows:bigint>"
      t(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.OrcStripeStats(unhex(hexStr)).as("__st"))
        .select(col("doc_id"),
          posexplode(coalesce(col("__st").cast(s"array<$tpe>"),
            array(lit(null).cast(tpe)))).as(Seq("stripe_idx", "__s")))
        .select(col("doc_id"), col("stripe_idx").cast("long").as("stripe_idx"),
          col("__s.offset").as("offset"),
          col("__s.index_length").as("index_length"),
          col("__s.data_length").as("data_length"),
          col("__s.number_of_rows").as("number_of_rows"))
        .orderBy("doc_id", "stripe_idx")
    }),
    // Hudi timeline census — a layout-exact .hoodie dir synthesized
    // in a scratch table dir: completed commit-class instants carry
    // write-stats JSON, pending states ride the file-name contract;
    // per-file rows/bytes come out without opening a data file
    "q307_hudi_commits" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-hudi")
      val h = java.nio.file.Files.createDirectories(tmp.resolve(".hoodie"))
      def commitJson(ts: String): String =
        s"""{"partitionToWriteStats":{
           |"lang=en":[{"fileId":"f1-$ts","path":"lang=en/f1-$ts.parquet",
           |"numWrites":100,"numDeletes":0,"numUpdateWrites":0,
           |"totalWriteBytes":1000,"fileSizeInBytes":1000}],
           |"lang=de":[{"fileId":"f2-$ts","path":"lang=de/f2-$ts.parquet",
           |"numWrites":50,"numDeletes":5,"numUpdateWrites":2,
           |"totalWriteBytes":500,"fileSizeInBytes":500}]},
           |"operationType":"UPSERT"}""".stripMargin
      java.nio.file.Files.write(h.resolve("001.commit"),
        commitJson("001").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.write(h.resolve("002.deltacommit"),
        commitJson("002").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.write(h.resolve("003.commit.requested"),
        Array.emptyByteArray)
      graft.sources.HudiTimeline.commitStats(s, tmp.toString)
        .orderBy("instant_ts", "partition")
    }),
    // .lz4 frame decoding — engine-framed spec-exact streams: m0 a
    // raw block + a block-DEPENDENT compressed block whose match
    // reaches back into block 1, m1 a skippable-frame prefix + a
    // frame with a VERIFIED xxh32 content checksum, m2 flips the
    // checksum byte and must refuse
    "q305_lz4" -> ((s, dir) => {
      val m0 = "04224d184040c00f00008068656c6c6f206c7a34206672616d65" +
        "050000000b0f00105a00000000"
      val m1 = "502a4d18040000006265656604224d1844405e0f000080636865" +
        "636b73756d6d6564206c7a34000000003c7bf0fd"
      val corrupt = m1.dropRight(2) +
        "%02x".format(Integer.parseInt(m1.takeRight(2), 16) ^ 1)
      val m = pmod(col("doc_id"), lit(3L))
      val hexStr = when(m === 0, lit(m0)).when(m === 1, lit(m1))
        .otherwise(lit(corrupt))
      t(s, dir, "documents")
        .select(col("doc_id"),
          decode(graft.functions.Lz4FramePayload(unhex(hexStr), 1 << 20),
            "UTF-8").as("lz4_text"))
        .orderBy("doc_id")
    }),
    // snappy framing format — engine-framed stream with two
    // uncompressed chunks (each chunk's MASKED CRC32C verified) and a
    // padding chunk between; m1 flips a CRC byte and must refuse
    "q306_snappy_frame" -> ((s, dir) => {
      val m0 = "ff060000734e61507059011600006ae05300736e61707079206" +
        "672616d65642074657874fe020000000001090000790e9328207461696c"
      // flip a byte INSIDE the first chunk's CRC field
      val corrupt = m0.substring(0, 30) +
        "%02x".format(Integer.parseInt(m0.substring(30, 32), 16) ^ 1) +
        m0.substring(32)
      val m = pmod(col("doc_id"), lit(2L))
      val hexStr = when(m === 0, lit(m0)).otherwise(lit(corrupt))
      t(s, dir, "documents")
        .select(col("doc_id"),
          decode(graft.functions.SnappyFramePayload(unhex(hexStr), 1 << 20),
            "UTF-8").as("sz_text"))
        .orderBy("doc_id")
    }),
    // avro DATUM decoding — a pinned null-codec container whose
    // record schema exercises union + array branches; each record
    // renders as one JSON object (the ingestion form); corrupt docs
    // keep one null audit row
    "q303_avro_records" -> ((s, dir) => {
      val a = "4f626a0102166176726f2e736368656d61be027b2274797065223a" +
        "227265636f7264222c226e616d65223a2272222c226669656c6473223a5b" +
        "7b226e616d65223a226964222c2274797065223a226c6f6e67227d2c7b22" +
        "6e616d65223a22746167222c2274797065223a5b226e756c6c222c227374" +
        "72696e67225d7d2c7b226e616d65223a227873222c2274797065223a7b22" +
        "74797065223a226172726179222c226974656d73223a22696e74227d7d5d" +
        "7d00030a11181f262d343b424950575e656c04160202026104020400"+
        "040000030a11181f262d343b424950575e656c"
      val corrupt = a.dropRight(2) +
        "%02x".format(Integer.parseInt(a.takeRight(2), 16) ^ 1)
      val m = pmod(col("doc_id"), lit(2L))
      val hexStr = when(m === 0, lit(a)).otherwise(lit(corrupt))
      t(s, dir, "documents")
        .select(col("doc_id"),
          explode(coalesce(
            graft.functions.AvroRecordsJson(unhex(hexStr))
              .cast("array<string>"),
            array(lit(null).cast("string")))).as("rec"))
        .orderBy("doc_id", "rec")
    }),
    // Iceberg snapshot census — a spec-layout table synthesized in a
    // scratch dir (pinned hand-framed manifest-list + manifest avro,
    // metadata JSON + version-hint): live files = non-deleted entries
    // minus v2 delete files, decoded by the engine's own avro kernel;
    // record counts are metadata-only numbers
    "q304_iceberg_snapshot" -> ((s, dir) => {
      val manifest = "4f626a0102166176726f2e736368656d6188067b2274797" +
        "065223a227265636f7264222c226e616d65223a226d616e69666573745f6" +
        "56e747279222c226669656c6473223a5b7b226e616d65223a22737461747" +
        "573222c2274797065223a22696e74227d2c7b226e616d65223a22736e617" +
        "073686f745f6964222c2274797065223a5b226e756c6c222c226c6f6e672" +
        "25d7d2c7b226e616d65223a22646174615f66696c65222c2274797065223" +
        "a7b2274797065223a227265636f7264222c226e616d65223a227232222c2" +
        "26669656c6473223a5b7b226e616d65223a22636f6e74656e74222c22747" +
        "97065223a22696e74227d2c7b226e616d65223a2266696c655f706174682" +
        "22c2274797065223a22737472696e67227d2c7b226e616d65223a2266696" +
        "c655f666f726d6174222c2274797065223a22737472696e67227d2c7b226" +
        "e616d65223a227265636f72645f636f756e74222c2274797065223a226c6" +
        "f6e67227d2c7b226e616d65223a2266696c655f73697a655f696e5f62797" +
        "46573222c2274797065223a226c6f6e67227d5d7d7d5d7d00030a11181f2" +
        "62d343b424950575e656c08840202020e001c646174612f612e706172717" +
        "565740e50415251554554c801d00f02020e001c646174612f622e7061727" +
        "17565740e504152515545549003a01f04020e0022646174612f676f6e652" +
        "e706172717565740e5041525155455412b40102020e0228646174612f646" +
        "56c657465732e706172717565740e504152515545540850030a11181f262" +
        "d343b424950575e656c"
      val mlist = "4f626a0102166176726f2e736368656d61b4037b227479706" +
        "5223a227265636f7264222c226e616d65223a226d616e69666573745f666" +
        "96c65222c226669656c6473223a5b7b226e616d65223a226d616e6966657" +
        "3745f70617468222c2274797065223a22737472696e67227d2c7b226e616" +
        "d65223a226d616e69666573745f6c656e677468222c2274797065223a226" +
        "c6f6e67227d2c7b226e616d65223a22706172746974696f6e5f737065635" +
        "f6964222c2274797065223a22696e74227d2c7b226e616d65223a2261646" +
        "465645f736e617073686f745f6964222c2274797065223a226c6f6e67227" +
        "d5d7d00030a11181f262d343b424950575e656c022a206d6574616461746" +
        "12f6d312e6176726ffa08000e030a11181f262d343b424950575e656c"
      def un(h: String): Array[Byte] =
        h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
      val tmp = java.nio.file.Files.createTempDirectory("graft-iceberg")
      val meta = java.nio.file.Files.createDirectories(
        tmp.resolve("metadata"))
      java.nio.file.Files.write(meta.resolve("m1.avro"), un(manifest))
      java.nio.file.Files.write(meta.resolve("snap-7.avro"), un(mlist))
      java.nio.file.Files.write(meta.resolve("v2.metadata.json"),
        ("""{"format-version":2,"table-uuid":"0000-test",""" +
          """"location":"x","current-snapshot-id":7,"snapshots":[""" +
          """{"snapshot-id":7,"timestamp-ms":2,""" +
          """"manifest-list":"metadata/snap-7.avro"}]}""")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.write(meta.resolve("version-hint.text"),
        "2".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      graft.sources.IcebergTable.snapshot(s, tmp.toString)
        .orderBy("file_path")
    }),
    // avro OCF block census — exact record/block/byte counts off the
    // block framing (count+size+sync per block), no datum decoded:
    // m0 a two-block deflate container, m1 a no-codec single block
    // (codec defaults to the spec's "null"), m2 corrupts the final
    // sync marker and keeps a null audit row
    "q302_avro_blocks" -> ((s, dir) => {
      val a = "4f626a0104146176726f2e636f6465630e6465666c617465166176" +
        "726f2e736368656d610a22696e742200030a11181f262d343b424950575e" +
        "656c060801020304030a11181f262d343b424950575e656c040209030a11" +
        "181f262d343b424950575e656c"
      val b = "4f626a0102166176726f2e736368656d610a22696e742200030a11" +
        "181f262d343b424950575e656c0e040000030a11181f262d343b42495057" +
        "5e656c"
      val badSync = a.dropRight(2) +
        "%02x".format(Integer.parseInt(a.takeRight(2), 16) ^ 1)
      val m = pmod(col("doc_id"), lit(3L))
      val hexStr = when(m === 0, lit(a)).when(m === 1, lit(b))
        .otherwise(lit(badSync))
      t(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.AvroBlocks(unhex(hexStr)).as("__b"))
        .select(col("doc_id"), col("__b.codec").as("codec"),
          col("__b.n_blocks").as("n_blocks"),
          col("__b.n_records").as("n_records"),
          col("__b.data_bytes").as("data_bytes"))
        .orderBy("doc_id")
    }),
    // legacy .ppt (PowerPoint 97) text — engine-built spec-exact deck
    // (tools/make_ppt_fixture.py): containers recurse, TextCharsAtom
    // and TextBytesAtom collect in stream order, CR/VT normalize; m1
    // poisons a container length, m2 the CFB signature — both null
    "q301_ppt_text" -> ((s, dir) => {
      val deck =
        "d0cf11e0a1b11ae1000000000000000000000000000000003e000300feff0900060000000000000000000000" +
        "010000000100000000000000001000000200000001000000feffffff0000000000000000" +
        "ff" * 432 +
        "fdfffffffefffffffefffffffe" +
        "ff" * 499 +
        "52006f006f007400200045006e007400720079" +
        "00" * 45 +
        "16000501ffffffffffffffff01" +
        "00" * 39 +
        "03000000000200000000000050006f0077006500720050006f0069006e007400200044006f00630075006d00" +
        "65006e0074" +
        "00" * 27 +
        "28000201ffffffffffffffffffffffff" +
        "00" * 40 +
        "a0" +
        "00" * 263 +
        "0100000002000000fe" +
        "ff" * 503 +
        "0f00e8038e0000000f00f00f7e0000000000a00f4a00000055006e00690063006f0064006500200073006c00" +
        "690064006500200014202000fc006e00ef0063006f0064006500200013270d007300650063006f006e006400" +
        "20006c0069006e0065000100e9030800000000000000000000000000a80f140000004279746573207469746c" +
        "650b7375627469746c650000ba0f0000000000007217020000000102" +
        "00" * 352
      // the Document container's length byte sits at stream offset 4
      // = file offset 512*4 + 4
      val badLen = deck.substring(0, (512 * 4 + 4) * 2) + "7f" +
        deck.substring((512 * 4 + 4) * 2 + 2)
      val corrupt = "58" + deck.drop(2)
      val m = pmod(col("doc_id"), lit(3L))
      val hexStr = when(m === 0, lit(deck)).when(m === 1, lit(badLen))
        .otherwise(lit(corrupt))
      t(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.PptText(unhex(hexStr), 1 << 24).as("ppt_text"))
        .orderBy("doc_id")
    }),
    // Delta-lake log census — a protocol-exact _delta_log synthesized
    // in a scratch table dir (no data file ever exists: the census
    // reads ONLY the log): v0 adds two partitioned files, v1 removes
    // one and adds another, v2 rewrites a path (same-version
    // remove+add resolves to the add). Live set = adds minus later
    // removes, one shuffle keyed by path.
    "q299_delta_snapshot" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-delta")
      val log = java.nio.file.Files.createDirectories(
        tmp.resolve("_delta_log"))
      def commit(v: Long, lines: Seq[String]): Unit =
        java.nio.file.Files.write(log.resolve(f"$v%020d.json"),
          lines.mkString("", "\n", "\n")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      commit(0, Seq(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        """{"metaData":{"id":"t1","name":"docs","schemaString":"{\"type\":\"struct\"}","partitionColumns":["lang"],"createdTime":1}}""",
        """{"add":{"path":"lang=en/a.parquet","partitionValues":{"lang":"en"},"size":100,"modificationTime":10,"dataChange":true}}""",
        """{"add":{"path":"lang=de/b.parquet","partitionValues":{"lang":"de"},"size":200,"modificationTime":11,"dataChange":true}}"""))
      commit(1, Seq(
        """{"remove":{"path":"lang=de/b.parquet","deletionTimestamp":20,"dataChange":true}}""",
        """{"add":{"path":"lang=de/c.parquet","partitionValues":{"lang":"de"},"size":300,"modificationTime":21,"dataChange":true}}"""))
      commit(2, Seq(
        """{"remove":{"path":"lang=en/a.parquet","deletionTimestamp":30,"dataChange":true}}""",
        """{"add":{"path":"lang=en/a.parquet","partitionValues":{"lang":"en"},"size":150,"modificationTime":31,"dataChange":true}}"""))
      graft.sources.DeltaLog.snapshot(s, tmp.toString)
        .select(col("path"), col("size"), col("modification_time"),
          col("partition_values")("lang").as("lang"),
          col("added_version"))
        .orderBy("path")
    }),
    // the same log's per-commit growth audit
    "q300_delta_history" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-deltah")
      val log = java.nio.file.Files.createDirectories(
        tmp.resolve("_delta_log"))
      def commit(v: Long, lines: Seq[String]): Unit =
        java.nio.file.Files.write(log.resolve(f"$v%020d.json"),
          lines.mkString("", "\n", "\n")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      commit(0, Seq(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        """{"metaData":{"id":"t1","name":"docs","schemaString":"{\"type\":\"struct\"}","partitionColumns":["lang"],"createdTime":1}}""",
        """{"add":{"path":"lang=en/a.parquet","partitionValues":{"lang":"en"},"size":100,"modificationTime":10,"dataChange":true}}""",
        """{"add":{"path":"lang=de/b.parquet","partitionValues":{"lang":"de"},"size":200,"modificationTime":11,"dataChange":true}}"""))
      commit(1, Seq(
        """{"remove":{"path":"lang=de/b.parquet","deletionTimestamp":20,"dataChange":true}}""",
        """{"add":{"path":"lang=de/c.parquet","partitionValues":{"lang":"de"},"size":300,"modificationTime":21,"dataChange":true}}"""))
      commit(2, Seq(
        """{"remove":{"path":"lang=en/a.parquet","deletionTimestamp":30,"dataChange":true}}""",
        """{"add":{"path":"lang=en/a.parquet","partitionValues":{"lang":"en"},"size":150,"modificationTime":31,"dataChange":true}}"""))
      graft.sources.DeltaLog.history(s, tmp.toString)
    }),
    // legacy .xls (BIFF8) cell grid — engine-built spec-exact
    // workbooks (tools/make_xls_fixture.py, mini-stream CFB layout):
    // m0 carries every cell-record kind over two sheets (LabelSst,
    // inline Label, Number, RK int/x100/double, MulRk, BoolErr,
    // Formula number/string/bool/empty), m1 splits an SST string
    // across a CONTINUE record with a wide-flag restart, m2 corrupts
    // the CFB signature and keeps one all-null audit row
    "q298_xls_cells" -> ((s, dir) => {
      val wbA =
        "d0cf11e0a1b11ae1000000000000000000000000000000003e000300feff0900060000000000000000000000" +
        "010000000100000000000000001000000200000001000000feffffff0000000000000000" +
        "ff" * 432 +
        "fdfffffffefffffffefffffffe" +
        "ff" * 499 +
        "52006f006f007400200045006e007400720079" +
        "00" * 45 +
        "16000501ffffffffffffffff01" +
        "00" * 39 +
        "03000000000200000000000057006f0072006b0062006f006f006b" +
        "00" * 49 +
        "12000201ffffffffffffffffffffffff" +
        "00" * 40 +
        "b401" +
        "00" * 262 +
        "010000000200000003000000040000000500000006000000fe" +
        "ff" * 487 +
        "0908100000060500bb0dcc070000000000000000fc002e00030000000300000005000068656c6c6f07000177" +
        "00f60072006c006400200013270400080100726963680000000085000a006600000000000200533185000a00" +
        "8e0100000000020053320a0000000908100000061000bb0dcc070000000000000000fd000a00000000000f00" +
        "00000000fd000a00000001000f000100000003020e00010000000f000000000000000a407e020a0001000100" +
        "0f00aa0000007e020a00010002000f00ef0100007e020a00010003000f0000000440bd001800020000000f00" +
        "060000000f000a0000000f000e000000020005020800030000000f00010005020800030001000f0007010600" +
        "1600040000000f000000000000001e40000000000000000006001600040001000f00000000000000ffff0000" +
        "00000000000007020500020000667806001600040002000f00010001000000ffff0000000000000000060016" +
        "00040003000f00030000000000ffff000000000000000004020f00050000000f00060000696e6c696e650a00" +
        "00000908100000061000bb0dcc070000000000000000fd000a00000000000f00020000000a" +
        "00" * 79
      val wbB =
        "d0cf11e0a1b11ae1000000000000000000000000000000003e000300feff0900060000000000000000000000" +
        "010000000100000000000000001000000200000001000000feffffff0000000000000000" +
        "ff" * 432 +
        "fdfffffffefffffffefffffffe" +
        "ff" * 499 +
        "52006f006f007400200045006e007400720079" +
        "00" * 45 +
        "16000501ffffffffffffffff01" +
        "00" * 39 +
        "03000000000200000000000057006f0072006b0062006f006f006b" +
        "00" * 49 +
        "12000201ffffffffffffffffffffffff" +
        "00" * 40 +
        "85" +
        "00" * 263 +
        "0100000002000000fe" +
        "ff" * 503 +
        "0908100000060500bb0dcc070000000000000000fc000f0002000000020000000a0000616161613c00140001" +
        "1104120413041404150416040400007461696c85000a00510000000000020053310a00000009081000000610" +
        "00bb0dcc070000000000000000fd000a00000000000f0000000000fd000a00000001000f00010000000a" +
        "00" * 382
      val corrupt = "58" + wbA.drop(2)
      val m = pmod(col("doc_id"), lit(3L))
      val hexStr = when(m === 0, lit(wbA)).when(m === 1, lit(wbB))
        .otherwise(lit(corrupt))
      val cellTpe = "struct<sheet:bigint,row:bigint,col:bigint,value:string>"
      t(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.XlsCells(unhex(hexStr)).as("__cs"))
        .select(col("doc_id"),
          explode(coalesce(col("__cs").cast(s"array<$cellTpe>"),
            array(lit(null).cast(cellTpe)))).as("__c"))
        .select(col("doc_id"), col("__c.sheet").as("sheet"),
          col("__c.row").as("row"), col("__c.col").as("col"),
          col("__c.value").as("value"))
        .orderBy("doc_id", "sheet", "row", "col")
    }),
    // zstd decompression against PINNED reference streams (stock
    // zstd-1.5.7 output embedded as constants — the kernel is graded
    // against the real format): raw block, predefined-FSE sequences,
    // an empty frame, concatenated frames, a skippable-frame
    // sandwich; %7==6 docs flip the checksum byte and must refuse
    "q290_zstd" -> ((s, dir) => {
      val hello = "28b52ffd241081000068656c6c6f207a73746420776f726c64" +
        "7f816860"
      val wiki = "28b52ffd645801b500007877696b692064756d7020746578742" +
        "0010046a49a751720de86"
      val runs = "28b52ffd642f005d00002061656e640100282a10027542211f"
      val empty = "28b52ffd240001000099e9d851"
      val skip = "502a4d180500000064656164ff" // skippable frame, 5 junk
      // corrupt: hello's checksum low byte flipped
      val corrupt = hello.dropRight(2) +
        "%02x".format(Integer.parseInt(hello.takeRight(2), 16) ^ 1)
      val m = pmod(col("doc_id"), lit(7L))
      val hexStr = when(m === 0, lit(hello)).when(m === 1, lit(wiki))
        .when(m === 2, lit(runs)).when(m === 3, lit(empty))
        .when(m === 4, lit(hello + wiki)) // concatenated frames
        .when(m === 5, lit(hello + skip + runs)) // skippable sandwich
        .otherwise(lit(corrupt))
      t(s, dir, "documents")
        .select(col("doc_id"),
          decode(graft.functions.ZstdPayload(unhex(hexStr), 1 << 20),
            "UTF-8").as("z_text"))
        .orderBy("doc_id")
    }),
    // the .jsonl.zst corpus front door: pinned CLI-written shards in
    // a scratch landing dir — a healthy 3-row shard, a bit-flipped
    // shard that must vanish WHOLE, and a shard whose malformed line
    // lands in the _corrupt quarantine while its good row survives
    "q291_jsonl_zst" -> ((s, dir) => {
      val shardA = "28B52FFD24D86D030062461518903B07ABB9C5C66B6EB505D9" +
        "5D627706A923E79CFDFD7C0240B416C2CC36BE4EAA286A08C33A763A692F" +
        "0B8088C833515F2BE0D5D93ACF6F8B0D335787FBBC0135B9FA424EFA9644" +
        "9FEF67FB6AE5DD5134768702082030E3F4CD1C9158B8B81C135A02C6B51C" +
        "CA56CD2A669343"
      val shardC = "28B52FFD245C6D0200C2451211907D6301066E50FAD0DDB1E4" +
        "7BBABE96192046E3D6B89CF5B99DD2ABF3EA9A055B90AFD43454E4873F0A" +
        "3F7985E89DF5C3D3F5E49934F1C3E3491DCE276FB3B21F06F9E40A9AE975" +
        "00B6FB5FA4"
      def un(h: String): Array[Byte] =
        h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
      val tmp = java.nio.file.Files.createTempDirectory("graft-jzst")
      java.nio.file.Files.write(tmp.resolve("a.jsonl.zst"), un(shardA))
      val bad = un(shardA)
      bad(bad.length - 3) = (bad(bad.length - 3) ^ 1).toByte
      java.nio.file.Files.write(tmp.resolve("b.jsonl.zst"), bad)
      java.nio.file.Files.write(tmp.resolve("c.jsonl.zst"), un(shardC))
      graft.sources.CorpusIO.readJsonlZst(s, tmp.toString)
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"),
          col(graft.sources.CorpusIO.corruptCol).isNotNull
            .as("quarantined"))
        .orderBy(coalesce(col("doc_id"), lit(-1L)))
    }),
    // ustar tarball walk: dir + two files with verified checksums
    // (engine-built headers — checksum = constant fixed-field sum +
    // short char-sum folds); every 8th doc corrupts a checksum and
    // the whole archive must vanish
    "q264_tar_entries" -> ((s, dir) =>
      Multimodal.tarList(tarFixture(s, dir))
        .orderBy("doc_id", "entry_idx")),
    // named-member extraction composed on the same walk: offsets and
    // sizes from the headers, bytes by plain substr (tar is
    // uncompressed)
    "q265_tar_member" -> ((s, dir) =>
      Multimodal.tarMemberText(tarFixture(s, dir), "src/main.py")
        .orderBy("doc_id")),
    // pptx slide text: DrawingML paragraphs to newlines, runs
    // concatenated, entities decoded; every 7th archive lacks the
    // slide — null
    "q266_pptx_text" -> ((s, dir) => {
      def leHex(c: Column, nBytes: Int) = concat((0 until nBytes).map(i =>
        lpad(hex(shiftright(c, 8 * i).bitwiseAND(255L)), 2, "0")): _*)
      val xml = concat(
        lit("<p:sld><p:cSld><a:p><a:r><a:t>Deck "),
        col("doc_id").cast("string"),
        lit("</a:t></a:r></a:p><a:p><a:r><a:t>Bullet &amp; " +
          "point</a:t></a:r></a:p></p:cSld></p:sld>"))
      val xb = xml.cast("binary")
      val xlen = length(xb).cast("long")
      val name = when(pmod(col("doc_id"), lit(7L)) === 0,
        lit("ppt/slides/other.xml ")) // 21 chars, wrong name
        .otherwise(lit("ppt/slides/slide1.xml"))
      val zip = concat(unhex(concat(lit("504B0304140000000000"),
          lit("00000000"), leHex(crc32(xb), 4), leHex(xlen, 4),
          leHex(xlen, 4), lit("15000000"))),
        name.cast("binary"), xb)
      val fixture = t(s, dir, "documents")
        .select(col("doc_id"), zip.as("payload")).localCheckpoint()
      fixture.select(col("doc_id"),
          Multimodal.pptxSlideText(col("payload")).as("slide_text"))
        .orderBy("doc_id")
    }),
    // sniff-dispatched document text over a MIXED lake: pdf, docx
    // zip, gzip plain and raw text payloads interleaved — each row
    // pays only its own parser
    "q275_document_text" -> ((s, dir) => {
      def leHex(c: Column, nBytes: Int) = concat((0 until nBytes).map(i =>
        lpad(hex(shiftright(c, 8 * i).bitwiseAND(255L)), 2, "0")): _*)
      val id = col("doc_id").cast("string")
      val pdf = concat(lit("%PDF-1.4\n1 0 obj << /Length 9 >>\n" +
        "stream\nBT (Doc "), id, lit(" pdf) Tj ET\nendstream\n%%EOF"))
      val docXml = concat(lit("<w:document><w:body><w:p><w:r><w:t>Doc "),
        id, lit(" docx</w:t></w:r></w:p></w:body></w:document>"))
      val db = docXml.cast("binary")
      val dl = length(db).cast("long")
      val docx = concat(unhex(concat(lit("504B030414000000000000000000"),
          leHex(crc32(db), 4), leHex(dl, 4), leHex(dl, 4),
          lit("11000000"))),
        lit("word/document.xml").cast("binary"), db)
      val plainGz = concat(lit("Doc "), id, lit(" gz plain")).cast("binary")
      val gl = length(plainGz).cast("long")
      val gz = concat(unhex(lit("1F8B08000000000000FF")),
        unhex(concat(lit("01"), leHex(gl, 2), leHex(lit(65535L) - gl, 2))),
        plainGz, unhex(concat(leHex(crc32(plainGz), 4), leHex(gl, 4))))
      val raw = concat(lit("Doc "), id, lit(" raw text")).cast("binary")
      // round 12: the zip branch routes by member names — xlsx, pptx
      // and epub payloads dispatch to their real tiers
      def member(name: String, body: Column) = {
        val bb = body.cast("binary")
        val bl = length(bb).cast("long")
        concat(unhex(concat(lit("504B0304140000000000" + "00000000"),
          leHex(crc32(bb), 4), leHex(bl, 4), leHex(bl, 4),
          lit("%02X000000".format(name.length)))),
          lit(name).cast("binary"), bb)
      }
      val xlsx = member("xl/sharedStrings.xml",
        concat(lit("<sst><si><t>Sheet cell "), id,
          lit("</t></si><si><t>B "), pmod(col("doc_id"), lit(9L))
            .cast("string"), lit("</t></si></sst>")))
      val pptx = member("ppt/slides/slide1.xml",
        concat(lit("<p:sld><a:p><a:r><a:t>Deck "), id,
          lit(" slide</a:t></a:r></a:p></p:sld>")))
      val epub = concat(
        member("META-INF/container.xml",
          lit("<container><rootfiles><rootfile full-path=\"ops/pkg.opf\"" +
            " media-type=\"x\"/></rootfiles></container>")),
        member("ops/pkg.opf",
          lit("<package><manifest><item id=\"c1\" href=\"c1.xhtml\"/>" +
            "</manifest><spine><itemref idref=\"c1\"/></spine></package>")),
        member("ops/c1.xhtml",
          concat(lit("<html><body><p>Book "), id,
            lit(" chapter.</p></body></html>"))))
      // round 13: unknown-kind zips route through the all-members
      // text (jars/source archives read instead of nulling)
      val srcZip = concat(
        member("src/main.py",
          concat(lit("print('doc "), id, lit("')"))),
        member("README.md",
          concat(lit("# Project "), id)))
      val m = pmod(col("doc_id"), lit(8L))
      val payload = when(m === 0, pdf.cast("binary"))
        .when(m === 1, docx).when(m === 2, gz)
        .when(m === 4, xlsx).when(m === 5, pptx).when(m === 6, epub)
        .when(m === 7, srcZip)
        .otherwise(raw)
      val fixture = t(s, dir, "documents")
        .select(col("doc_id"), payload.as("payload")).localCheckpoint()
      Multimodal.documentText(fixture).orderBy("doc_id")
    }),
    // scholarly identifiers: a DOI with trailing sentence punctuation
    // to strip, a new-form and an old-form arXiv id per doc
    "q274_citation_scan" -> ((s, dir) => {
      val text = concat(
        lit("See doi:10.1234/abc."), col("doc_id").cast("string"),
        lit(", also arXiv:2301.0"),
        pmod(col("doc_id"), lit(10L)).cast("string"),
        lit("123 and the legacy arXiv:math.GT/0309136."))
      TextAnalysis.citationScan(
          t(s, dir, "documents").select(col("doc_id"), text.as("text")))
        .orderBy("doc_id", "pos")
    }),
    // avro OCF header: the embedded schema JSON recovered through the
    // binary map encoding (two-byte varint for the schema length);
    // every 4th file has a corrupt magic
    "q273_avro_schema" -> ((s, dir) => {
      def leHex(c: Column, nBytes: Int) = concat((0 until nBytes).map(i =>
        lpad(hex(shiftright(c, 8 * i).bitwiseAND(255L)), 2, "0")): _*)
      def vint(len: Column): Column = { // zigzag varint of a length
        val zz = len * 2L
        when(zz < 128L, leHex(zz, 1))
          .otherwise(concat(leHex(zz.bitwiseAND(127L) + 128L, 1),
            leHex(shiftright(zz, 7), 1)))
      }
      val schema = concat(
        lit("{\"type\":\"record\",\"name\":\"doc\",\"fields\":" +
          "[{\"name\":\"id\",\"type\":\"long\"},{\"name\":\"t"),
        col("doc_id").cast("string"),
        lit("\",\"type\":\"string\"}]}"))
      val sb = schema.cast("binary")
      val magic = when(pmod(col("doc_id"), lit(4L)) === 3,
        lit("DEAD6A01")).otherwise(lit("4F626A01"))
      val ocf = concat(unhex(magic), unhex(lit("04")),
        unhex(lit("14")), lit("avro.codec").cast("binary"),
        unhex(lit("08")), lit("null").cast("binary"),
        unhex(lit("16")), lit("avro.schema").cast("binary"),
        unhex(vint(length(sb).cast("long"))), sb,
        unhex(lit("00" * 17))) // end marker + 16-byte sync
      val fixture = t(s, dir, "documents")
        .select(col("doc_id"), ocf.as("payload")).localCheckpoint()
      fixture.select(col("doc_id"),
          Multimodal.avroSchema(col("payload")).as("avro_schema"))
        .orderBy("doc_id")
    }),
    // epub metadata: mimetype + container.xml + the OPF it NAMES
    // (per-row member name through the dynamic kernel), Dublin Core
    // fields entity-decoded; every 5th book lacks the container
    "q272_epub_meta" -> ((s, dir) => {
      def leHex(c: Column, nBytes: Int) = concat((0 until nBytes).map(i =>
        lpad(hex(shiftright(c, 8 * i).bitwiseAND(255L)), 2, "0")): _*)
      def sm(name: String, body: Column): Column = {
        val bb = body.cast("binary")
        val bl = length(bb).cast("long")
        concat(unhex(concat(lit("504B030414000000000000000000"),
            leHex(crc32(bb), 4), leHex(bl, 4), leHex(bl, 4),
            leHex(lit(name.length.toLong), 2), lit("0000"))),
          lit(name).cast("binary"), bb)
      }
      val opf = concat(
        lit("<package><metadata><dc:title>Book "),
        col("doc_id").cast("string"),
        lit(" &amp; friends</dc:title><dc:creator>Author "),
        pmod(col("doc_id"), lit(7L)).cast("string"),
        lit("</dc:creator><dc:language>en</dc:language>" +
          "</metadata></package>"))
      val container = lit("<?xml version=\"1.0\"?><container><rootfiles>" +
        "<rootfile full-path=\"OEBPS/content.opf\" " +
        "media-type=\"application/oebps-package+xml\"/>" +
        "</rootfiles></container>")
      val epub = concat(sm("mimetype", lit("application/epub+zip")),
        // the container member name flips per branch but keeps the
        // 22-char length so ONE header builder serves both
        when(pmod(col("doc_id"), lit(5L)) === 0,
          sm("META-INF/misnamed.xml ", container))
          .otherwise(sm("META-INF/container.xml", container)),
        sm("OEBPS/content.opf", opf))
      val fixture = t(s, dir, "documents")
        .select(col("doc_id"), epub.as("payload")).localCheckpoint()
      Multimodal.epubMeta(fixture).orderBy("doc_id")
    }),
    // crawl-to-corpus composition: .warc.gz archive -> record parse
    // -> HTTP-200 gate -> htmlToText -> per-doc content dedup. Four
    // records per archive: r0/r2 identical bodies (the dup), r1
    // distinct, r3 a 404 the gate must drop; every 9th archive
    // corrupt (whole archive gone)
    "q271_crawl_pipeline" -> ((s, dir) => {
      def leHex(c: Column, nBytes: Int) = concat((0 until nBytes).map(i =>
        lpad(hex(shiftright(c, 8 * i).bitwiseAND(255L)), 2, "0")): _*)
      def member(r: Int): Column = {
        val body =
          if (r == 1) concat(lit("<html>"), substring(col("text"), 1, 20),
            lit(" extra</html>"))
          else concat(lit("<html>"), substring(col("text"), 1, 20),
            lit("</html>"))
        val status = if (r == 3) "404 Not Found" else "200 OK"
        val warc = concat(
          lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: " +
            "https://site.example.com/p"),
          col("doc_id").cast("string"),
          lit(s"r$r\r\n\r\nHTTP/1.1 $status\r\n" +
            "Content-Type: text/html\r\n\r\n"), body)
        val wb = warc.cast("binary")
        val len = length(wb).cast("long")
        val magic = if (r == 2)
          when(pmod(col("doc_id"), lit(9L)) === 0,
            lit("DEAD08000000000000FF"))
            .otherwise(lit("1F8B08000000000000FF"))
        else lit("1F8B08000000000000FF")
        concat(unhex(magic), unhex(concat(lit("01"),
            leHex(len, 2), leHex(lit(65535L) - len, 2))),
          wb, unhex(concat(leHex(crc32(wb), 4), leHex(len, 4))))
      }
      val fixture = t(s, dir, "documents")
        .select(col("doc_id"),
          concat(member(0), member(1), member(2), member(3)).as("warc_gz"))
        .localCheckpoint()
      TextAnalysis.warcParseGzFile(fixture)
        .filter(col("http_status") === 200)
        .select(col("doc_id"),
          TextAnalysis.htmlToText(col("body")).as("page_text"),
          col("rec_idx"))
        .groupBy(col("doc_id"), col("page_text"))
        .agg(min(col("rec_idx")).as("first_rec"),
          count(lit(1)).as("n_copies"))
        .orderBy("doc_id", "first_rec")
    }),
    // JPEG EXIF IFD0: little-endian TIFF, dynamic Make at its
    // computed value offset, inline SHORT orientation, absent Model;
    // every 10th image carries no APP1 — null struct
    "q270_jpeg_exif" -> ((s, dir) => {
      def leHex(c: Column, nBytes: Int) = concat((0 until nBytes).map(i =>
        lpad(hex(shiftright(c, 8 * i).bitwiseAND(255L)), 2, "0")): _*)
      def beHex(c: Column, nBytes: Int) = concat((0 until nBytes).map(i =>
        lpad(hex(shiftright(c, 8 * (nBytes - 1 - i)).bitwiseAND(255L)),
          2, "0")): _*)
      val mk = concat(lit("Cam "), col("doc_id").cast("string"))
      val ml = length(mk).cast("long")
      val orient = pmod(col("doc_id"), lit(8L)) + 1L
      val dt = lit("2026:01:02 03:04:05")
      val tiffHex = concat(
        lit("49492A0008000000" + "0300"),
        lit("12010300"), lit("01000000"), leHex(orient, 2), lit("0000"),
        lit("0F010200"), leHex(ml + 1L, 4), leHex(lit(50L), 4),
        lit("32010200"), leHex(lit(20L), 4), leHex(ml + 51L, 4),
        lit("00000000"))
      val tiffLen = lit(50L) + ml + 1L + 20L
      val jpeg = when(pmod(col("doc_id"), lit(10L)) === 0,
        unhex(lit("FFD8FFD9")))
        .otherwise(concat(unhex(lit("FFD8FFE1")),
          unhex(beHex(tiffLen + 8L, 2)),
          unhex(lit("457869660000")),
          unhex(tiffHex), mk.cast("binary"), unhex(lit("00")),
          dt.cast("binary"), unhex(lit("00")),
          unhex(lit("FFD9"))))
      val fixture = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), jpeg.as("payload"))
        .localCheckpoint()
      fixture.select(col("media_id"),
          Multimodal.jpegExif(col("payload")).as("__e"))
        .select(col("media_id"), col("__e.orientation").as("orientation"),
          col("__e.make").as("make"), col("__e.model").as("model"),
          col("__e.datetime").as("datetime"))
        .orderBy("media_id")
    }),
    // SRT cue parsing: comma-millisecond timestamps, declared cue
    // indices kept (1 then 3 — real files skip), multiline cue text
    "q269_srt_parse" -> ((s, dir) => {
      val ss = lpad(pmod(col("doc_id"), lit(60L)).cast("string"), 2, "0")
      val mm = lpad(pmod(col("doc_id"), lit(10L)).cast("string"), 2, "0")
      val srt = concat(
        lit("1\n00:00:"), ss, lit(",000 --> 00:00:"), ss,
        lit(",900\nFirst sub for doc "), col("doc_id").cast("string"),
        lit(".\n\n"),
        lit("3\n00:"), mm, lit(":10,500 --> 00:"), mm,
        lit(":12,750\nSecond line one.\nLine two."))
      TextAnalysis.srtParse(
          t(s, dir, "documents").select(col("doc_id"), srt.as("srt")))
        .orderBy("doc_id", "block_pos")
    }),
    // ID3v2.3 text frames: latin1 TIT2 + utf8 TPE1 with a COMM frame
    // between them (skipped, not fatal); every 6th tag declares an
    // absurd frame size — the whole tag must fail closed to no rows
    "q268_id3_tags" -> ((s, dir) => {
      def beHex(c: Column, nBytes: Int) = concat((0 until nBytes).map(i =>
        lpad(hex(shiftright(c, 8 * (nBytes - 1 - i)).bitwiseAND(255L)),
          2, "0")): _*)
      def ssHex(c: Column) = concat(Seq(21, 14, 7, 0).map(sh =>
        lpad(hex(shiftright(c, sh).bitwiseAND(127L)), 2, "0")): _*)
      val t1 = concat(lit("Track "), col("doc_id").cast("string"))
      val l1 = length(t1).cast("long")
      val badSize = pmod(col("doc_id"), lit(6L)) === 0
      val f1 = concat(lit("TIT2").cast("binary"),
        unhex(concat(beHex(when(badSize, lit(1L << 27))
          .otherwise(l1 + 1L), 4), lit("000000"))),
        t1.cast("binary"))
      val comm = concat(lit("COMM").cast("binary"),
        unhex(concat(beHex(lit(5L), 4), lit("000000"))),
        lit("engx").cast("binary"))
      val t2 = lit("Artist & co")
      val f2 = concat(lit("TPE1").cast("binary"),
        unhex(concat(beHex(lit(12L), 4), lit("000003"))),
        t2.cast("binary"))
      val total = (l1 + 11L) + 15L + 22L
      val tag = concat(lit("ID3").cast("binary"), unhex(lit("030000")),
        unhex(ssHex(total)), f1, comm, f2)
      val fixture = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), tag.as("payload"))
        .localCheckpoint()
      Multimodal.id3Tags(fixture).orderBy("media_id", "pos")
    }),
    // .tar.gz end to end: one gunzip (CRC-verified) feeding the
    // checksummed ustar walk — same entries as q264, same corrupt
    // exclusions (the bad tar checksum survives the gzip wrap and
    // must still drop the archive)
    "q267_targz_list" -> ((s, dir) =>
      Multimodal.tarGzList(tarFixture(s, dir, gz = true))
        .orderBy("doc_id", "entry_idx")),
    // xlsx shared strings: plain, rich-run (runs concatenate) and
    // entity-bearing entries; every 7th archive names the member
    // differently — no rows (member-not-found fail-closed)
    "q263_xlsx_strings" -> ((s, dir) => {
      def leHex(c: Column, nBytes: Int) = concat((0 until nBytes).map(i =>
        lpad(hex(shiftright(c, 8 * i).bitwiseAND(255L)), 2, "0")): _*)
      val xml = concat(
        lit("<?xml version=\"1.0\"?><sst><si><t>Plain "),
        col("doc_id").cast("string"),
        lit("</t></si><si><r><rPr/><t>Rich </t></r><r><t>run</t></r>" +
          "</si><si><t xml:space=\"preserve\">AT&amp;T value</t></si>" +
          "</sst>"))
      val xb = xml.cast("binary")
      val xlen = length(xb).cast("long")
      val name = when(pmod(col("doc_id"), lit(7L)) === 0,
        lit("xl/other_strings.xml")).otherwise(lit("xl/sharedStrings.xml"))
      val isStored = pmod(col("doc_id"), lit(2L)) === 0
      val methodHex = when(isStored, lit("0000")).otherwise(lit("0800"))
      val csize = when(isStored, xlen).otherwise(xlen + 5L)
      val data = when(isStored, xb).otherwise(concat(
        unhex(concat(lit("01"), leHex(xlen, 2),
          leHex(lit(65535L) - xlen, 2))), xb))
      val zip = concat(unhex(concat(lit("504B030414000000"), methodHex,
          lit("00000000"), leHex(crc32(xb), 4), leHex(csize, 4),
          leHex(xlen, 4), lit("14000000"))),
        name.cast("binary"), data)
      val fixture = t(s, dir, "documents")
        .select(col("doc_id"), zip.as("payload")).localCheckpoint()
      Multimodal.xlsxSharedStrings(fixture).orderBy("doc_id", "si_idx")
    }),
    // simple-PDF text extraction: uncompressed content streams (the
    // valid no-/Filter form — units cover FlateDecode with a real
    // Deflater), Tj + TJ-array + ' show ops, BT blocks and streams
    // joined per the documented contract; every 13th doc is not a
    // PDF and yields the null struct
    "q262_pdf_text" -> ((s, dir) => {
      val s1 = concat(
        lit("BT /F1 12 Tf 72 720 Td (Hello doc "),
        col("doc_id").cast("string"),
        lit(") Tj T* [(A) -120 (B)] TJ ET"))
      val s2 = lit("BT (Part) Tj (two) ' ET")
      def obj(n: Int, body: Column): Column = concat(
        lit(s"$n 0 obj << /Length 99 >>\nstream\n"), body,
        lit("\nendstream\nendobj\n"))
      val pdf = concat(lit("%PDF-1.4\n"), obj(1, s1),
        when(pmod(col("doc_id"), lit(2L)) === 0, obj(2, s2))
          .otherwise(lit("")),
        lit("%%EOF"))
      val payload = when(pmod(col("doc_id"), lit(13L)) === 0,
        lit("plain text, not a pdf")).otherwise(pdf).cast("binary")
      val fixture = t(s, dir, "documents")
        .select(col("doc_id"), payload.as("payload")).localCheckpoint()
      fixture.select(col("doc_id"),
          Multimodal.pdfText(col("payload")).as("__p"))
        .select(col("doc_id"), col("__p.text").as("pdf_text"),
          col("__p.n_streams").as("n_streams"),
          col("__p.n_decoded").as("n_decoded"))
        .orderBy("doc_id")
    }),
    // a whole .warc.gz archive per doc: THREE concatenated stored-
    // block gzip members, each one WARC record; every ninth doc
    // corrupts its SECOND member's magic — the whole archive must
    // fail closed (doc absent), never partial rows
    "q261_warc_gz_file" -> ((s, dir) => {
      def leHex(c: Column, nBytes: Int) = concat((0 until nBytes).map(i =>
        lpad(hex(shiftright(c, 8 * i).bitwiseAND(255L)), 2, "0")): _*)
      def member(r: Int): Column = {
        val warc = concat(
          lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: " +
            "https://site"),
          pmod(col("doc_id"), lit(7L)).cast("string"),
          lit(".example.com/p"), col("doc_id").cast("string"),
          lit(s"r$r\r\nWARC-Date: 2026-01-01T00:00:00Z\r\n" +
            "Content-Length: "),
          col("n_chars").cast("string"),
          lit("\r\n\r\nHTTP/1.1 200 OK\r\nContent-Type: text/html" +
            "\r\n\r\n<html>"),
          substring(col("text"), 1, 20), lit(s"r$r</html>"))
        val wb = warc.cast("binary")
        val len = length(wb).cast("long")
        val magic = if (r == 1)
          when(pmod(col("doc_id"), lit(9L)) === 0,
            lit("DEAD08000000000000FF"))
            .otherwise(lit("1F8B08000000000000FF"))
        else lit("1F8B08000000000000FF")
        concat(unhex(magic), unhex(concat(lit("01"),
            leHex(len, 2), leHex(lit(65535L) - len, 2))),
          wb, unhex(concat(leHex(crc32(wb), 4), leHex(len, 4))))
      }
      val fixture = t(s, dir, "documents")
        .select(col("doc_id"),
          concat(member(0), member(1), member(2)).as("warc_gz"))
        .localCheckpoint()
      TextAnalysis.warcParseGzFile(fixture).orderBy("doc_id", "rec_idx")
    }),
    // docx text extraction: a two-member ZIP ([Content_Types].xml
    // then word/document.xml) built from hex expressions — member 2
    // stored for even ids, raw-DEFLATE (stored-block framing) for
    // odd, and a data-descriptor flag on one row in seven, which
    // must fail closed to null
    "q256_docx_text" -> ((s, dir) => {
      def leHex(c: Column, nBytes: Int) = concat((0 until nBytes).map(i =>
        lpad(hex(shiftright(c, 8 * i).bitwiseAND(255L)), 2, "0")): _*)
      val xml = concat(
        lit("<?xml version=\"1.0\"?><w:document><w:body>" +
          "<w:p><w:r><w:t>Title "),
        col("doc_id").cast("string"),
        lit("</w:t></w:r></w:p><w:p><w:r><w:t xml:space=\"preserve\">"),
        substring(col("text"), 1, 30),
        lit(" &amp; more</w:t></w:r></w:p></w:body></w:document>"))
      val xb = xml.cast("binary")
      val xlen = length(xb).cast("long")
      val ct = lit("<Types/>").cast("binary")
      val m1 = concat(unhex(concat(lit("504B030414000000000000000000"),
          leHex(crc32(ct), 4), leHex(lit(8L), 4), leHex(lit(8L), 4),
          lit("13000000"))),
        lit("[Content_Types].xml").cast("binary"), ct)
      val isDD = pmod(col("doc_id"), lit(7L)) === 0
      val isStored = pmod(col("doc_id"), lit(2L)) === 0
      val flagsHex = when(isDD, lit("0800")).otherwise(lit("0000"))
      val methodHex = when(isStored, lit("0000")).otherwise(lit("0800"))
      val csize = when(isStored, xlen).otherwise(xlen + 5L)
      val data = when(isStored, xb).otherwise(concat(
        unhex(concat(lit("01"), leHex(xlen, 2),
          leHex(lit(65535L) - xlen, 2))), xb))
      // data-descriptor rows are the REAL streaming-writer shape:
      // zeroed crc/sizes in the local header, a PK\x07\x08 descriptor
      // after the data, and a central directory + EOCD carrying the
      // exact sizes (the only place they exist) — resolved CD-first.
      // Non-DD rows stay CD-less and exercise the local-walk fallback.
      val m2 = concat(unhex(concat(lit("504B03041400"), flagsHex,
          methodHex, lit("00000000"),
          when(isDD, lit("000000000000000000000000"))
            .otherwise(concat(leHex(crc32(xb), 4), leHex(csize, 4),
              leHex(xlen, 4))),
          lit("11000000"))),
        lit("word/document.xml").cast("binary"), data,
        when(isDD, unhex(concat(lit("504B0708"), leHex(crc32(xb), 4),
          leHex(csize, 4), leHex(xlen, 4))))
          .otherwise(lit(Array.empty[Byte])))
      // m1 is 57 bytes, m2's local chain 63+csize (+16 descriptor);
      // CD entries are 46+19 and 46+17 bytes => cdSize 128
      val cd = concat(
        unhex(concat(lit("504B0102" + "14001400" + "00000000" + "00000000"),
          leHex(crc32(ct), 4), lit("0800000008000000" + "1300" +
            "00000000000000000000000000000000"))),
        lit("[Content_Types].xml").cast("binary"),
        unhex(concat(lit("504B0102" + "14001400" + "0800"), methodHex,
          lit("00000000"), leHex(crc32(xb), 4), leHex(csize, 4),
          leHex(xlen, 4), lit("1100" + "000000000000000000000000"),
          leHex(lit(57L), 4))),
        lit("word/document.xml").cast("binary"),
        unhex(concat(lit("504B0506" + "00000000" + "02000200" + "80000000"),
          leHex(lit(120L) + csize, 4), lit("0000"))))
      // checkpoint the synthesized archive (fixture-payload rule)
      val fixture = t(s, dir, "documents")
        .select(col("doc_id"), concat(m1, m2,
          when(isDD, cd).otherwise(lit(Array.empty[Byte]))).as("payload"))
        .localCheckpoint()
      fixture.select(col("doc_id"),
          Multimodal.docxText(col("payload")).as("docx_text"))
        .orderBy("doc_id")
    }),
    // feed parsing: RSS for even domains, Atom for odd — item order,
    // both link forms, missing pubDate on the second entry; every
    // row derived arithmetically
    "q221_feed_parse" -> ((s, dir) => {
      val d = col("__d")
      val rss = concat(
        lit("<?xml version=\"1.0\"?><rss><channel>" +
          "<item><title>Post one on site"), d,
        lit("</title><link>https://site"), d,
        lit(".example.com/a1</link><pubDate>Mon, 01 Jan 2026</pubDate></item>" +
          "<item><title> Post two </title><link>https://site"), d,
        lit(".example.com/a2</link></item></channel></rss>"))
      val atom = concat(
        lit("<?xml version=\"1.0\"?><feed>" +
          "<entry><title>Entry one on site"), d,
        lit("</title><link rel=\"alternate\" href=\"https://site"), d,
        lit(".example.com/e1\"/><updated>2026-01-02</updated></entry>" +
          "<entry><title> Entry two </title><link href=\"https://site"), d,
        lit(".example.com/e2\"/></entry></feed>"))
      val feeds = t(s, dir, "documents")
        .select(pmod(col("doc_id"), lit(7L)).cast("string").as("__d")).distinct()
        .select(concat(lit("site"), d, lit(".example.com")).as("domain"),
          when(pmod(d.cast("long"), lit(2L)) === 0, rss).otherwise(atom).as("xml"))
      TextAnalysis.feedParse(feeds).orderBy("domain", "pos")
    }),
    // Open Graph pairs: both attribute orders, page order kept
    "q222_og_tags" -> ((s, dir) => {
      val html = concat(
        lit("<html><head><meta property=\"og:title\" content=\"Card "),
        col("doc_id").cast("string"),
        lit("\"><meta property=\"og:type\" content=\"article\">"),
        when(pmod(col("doc_id"), lit(3L)) === 0,
          concat(lit("<meta content=\"https://img.example.com/i"),
            pmod(col("doc_id"), lit(9L)).cast("string"),
            lit(".png\" property=\"og:image\">"))).otherwise(lit("")),
        lit("<meta name=\"description\" content=\"not og\"></head><body>"),
        substring(col("text"), 1, 20), lit("</body></html>"))
      TextAnalysis.ogTags(
          t(s, dir, "documents").select(col("doc_id"), html.as("html")))
        .orderBy("doc_id", "pos")
    }),
    // reply cleaning: quoted lines, an attribution line and an RFC
    // 3676 signature block all drop; counts exact
    "q223_strip_quoted" -> ((s, dir) => {
      val text = concat_ws("\n",
        concat(lit("Reply body line one for doc "),
          col("doc_id").cast("string"), lit(".")),
        lit("> quoted original line"),
        lit(">> deeper quote"),
        lit("On Monday, someone wrote:"),
        concat(lit("Second body line "),
          pmod(col("doc_id"), lit(7L)).cast("string"), lit(".")),
        lit("-- "),
        lit("Signature Name"),
        lit("https://sig.example.com"))
      TextAnalysis.stripQuotedReply(
          t(s, dir, "documents").select(col("doc_id"), text.as("text")))
        .orderBy("doc_id")
    }),
    // HTML table mining: a header row + data rows with entities in
    // cells, plus a second table on doc_id%4==0 — every cell row
    // derived arithmetically
    "q220_html_tables" -> ((s, dir) => {
      val html = concat(
        lit("<p>"), substring(col("text"), 1, 20), lit("</p>" +
          "<TABLE class=\"data\"><tr><th>Name</th><th>Value</th></tr>" +
          "<tr><td>alpha &amp; co</td><td>"),
        col("doc_id").cast("string"), lit("</td></tr></TABLE>"),
        when(pmod(col("doc_id"), lit(4L)) === 0,
          concat(lit("<table><tr><td> solo "),
            pmod(col("doc_id"), lit(9L)).cast("string"),
            lit(" </td></tr></table>"))).otherwise(lit("")))
      TextAnalysis.htmlTables(
          t(s, dir, "documents").select(col("doc_id"), html.as("html")))
        .orderBy("doc_id", "table_idx", "row_idx", "col_idx")
    }),
    // FLAC audio-grain fingerprint: same audio bytes behind
    // different-size padding blocks hash identically — metadata
    // drops out, the oracle predicts md5(text)
    "q219_flac_fingerprint" -> ((s, dir) => {
      val k = pmod(col("doc_id"), lit(5L))
      def be(c: Column, n: Int) = lpad(hex(c), 2 * n, "0")
      val hexStr = concat(
        lit("664C6143" + "00" + "000022" + "0" * 68 + "81"),
        be(k, 3), lit("0000000000").substr(lit(1), k * 2),
        hex(col("text").cast("binary")))
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), unhex(hexStr).as("payload"))
        .localCheckpoint()
      Multimodal.payloadFingerprint(media).orderBy("media_id")
    }),
    // WARC record parsing: response records (status/content-type
    // rotating) and warcinfo records (no HTTP block) — headers,
    // status line and body all derived arithmetically
    "q217_warc_parse" -> ((s, dir) => {
      val isInfo = pmod(col("doc_id"), lit(3L)) === 0
      val uri = concat(lit("https://site"),
        pmod(col("doc_id"), lit(7L)).cast("string"),
        lit(".example.com/p"), col("doc_id").cast("string"))
      val status = when(pmod(col("doc_id"), lit(2L)) === 0,
        lit("200 OK")).otherwise(lit("404 Not Found"))
      val ctype = when(pmod(col("doc_id"), lit(2L)) === 0,
        lit("text/html; charset=UTF-8")).otherwise(lit("text/plain"))
      val body = concat(lit("<html><body>"), substring(col("text"), 1, 40),
        lit("</body></html>"))
      val warc = when(isInfo, concat(
          lit("WARC/1.0\r\nWARC-Type: warcinfo\r\n" +
            "WARC-Date: 2026-01-01T00:00:00Z\r\nContent-Length: "),
          col("n_chars").cast("string"),
          lit("\r\n\r\nsoftware: graft-fixture "), col("doc_id").cast("string")))
        .otherwise(concat(
          lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "), uri,
          lit("\r\nWARC-Date: 2026-01-01T00:00:00Z\r\nContent-Length: "),
          col("n_chars").cast("string"),
          lit("\r\n\r\nHTTP/1.1 "), status,
          lit("\r\nContent-Type: "), ctype,
          lit("\r\n\r\n"), body))
      TextAnalysis.warcParse(
          t(s, dir, "documents").select(col("doc_id"), warc.as("warc")))
        .orderBy("doc_id")
    }),
    // Sitemap: discovery — a GLOBAL robots directive (lives outside
    // any User-agent section), one row per declared sitemap in order
    "q218_robots_sitemaps" -> ((s, dir) => {
      val robots = t(s, dir, "documents")
        .select(pmod(col("doc_id"), lit(7L)).cast("string").as("__d")).distinct()
        .select(concat(lit("site"), col("__d"), lit(".example.com")).as("domain"),
          concat(lit("Sitemap: https://site"), col("__d"),
            lit(".example.com/sitemap.xml\nUser-agent: *\nDisallow: /x\n" +
              "sitemap: https://cdn.maps.net/shared"), col("__d"),
            lit(".xml")).as("robots"))
      TextAnalysis.robotsSitemaps(robots).orderBy("domain", "pos")
    }),
    // UTF-8 validity QA: ASCII text bytes + doc_id%4 stray 0xFF bytes
    // + a valid 2-byte char on even docs — replacement events and the
    // strict verdict predicted arithmetically
    "q214_utf8_stats" -> ((s, dir) => {
      val k = pmod(col("doc_id"), lit(4L))
      val even = pmod(col("doc_id"), lit(2L)) === 0
      val hexStr = concat(hex(col("text").cast("binary")),
        lit("FFFFFFFF").substr(lit(1), k * 2),
        when(even, lit("C3A9")).otherwise(lit("")))
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), unhex(hexStr).as("payload"))
      Multimodal.encodingStats(media).orderBy("media_id")
    }),
    // Crawl-delay extraction: first wildcard-section value wins,
    // other-section and absent directives yield no row
    "q215_crawl_delay" -> ((s, dir) => {
      def robotsFor(d: Column) =
        when(d === "5", concat_ws("\n", lit("User-agent: gptbot"),
          lit("Crawl-delay: 9"), lit("User-agent: *"), lit("Disallow: /x")))
        .when(d === "6", concat_ws("\n", lit("User-agent: *"),
          lit("Disallow: /y")))
        .otherwise(concat_ws("\n", lit("User-agent: *"), lit("Disallow: /x"),
          concat(lit("Crawl-delay: "), d, lit(".5")),
          lit("Crawl-delay: 99")))
      val robots = t(s, dir, "documents")
        .select(pmod(col("doc_id"), lit(7L)).cast("string").as("__d")).distinct()
        .select(concat(lit("site"), col("__d"), lit(".example.com")).as("domain"),
          robotsFor(col("__d")).as("robots"))
      TextAnalysis.robotsCrawlDelay(robots).orderBy("domain")
    }),
    // frontier composition: sitemap entries x robots verdicts x
    // politeness delays — three operators composed end to end
    "q216_crawl_frontier" -> ((s, dir) => {
      val doms = t(s, dir, "documents")
        .select(pmod(col("doc_id"), lit(7L)).cast("string").as("__d")).distinct()
      val sm = doms.select(
        concat(lit("site"), col("__d"), lit(".example.com")).as("domain"),
        concat(lit("<urlset><url><loc>https://site"), col("__d"),
          lit(".example.com/p1</loc></url><url><loc>https://site"), col("__d"),
          lit(".example.com/private/p2</loc></url></urlset>")).as("xml"))
      val robots = doms.select(
        concat(lit("site"), col("__d"), lit(".example.com")).as("domain"),
        when(pmod(col("__d").cast("long"), lit(2L)) === 0,
          concat_ws("\n", lit("User-agent: *"), lit("Disallow: /private/"),
            lit("Crawl-delay: 1.5")))
        .otherwise(concat_ws("\n", lit("User-agent: *"), lit("Disallow:")))
          .as("robots"))
      val entries = TextAnalysis.sitemapParse(sm)
      val gated = TextAnalysis.robotsGate(
        entries.select(col("pos"), col("loc")), robots,
        idCol = "pos", urlCol = "loc")
      gated.join(TextAnalysis.robotsCrawlDelay(robots), Seq("domain"), "left")
        .select(col("domain"), col("pos"), col("loc"), col("allowed"),
          col("crawl_delay"))
        .orderBy("domain", "pos")
    }),
    // WebVTT cue parsing: header + NOTE blocks skipped, two cues per
    // doc with formula timestamps (second crosses a minute boundary);
    // the oracle derives start/end milliseconds arithmetically
    "q211_vtt_parse" -> ((s, dir) => {
      val ss = lpad(pmod(col("doc_id"), lit(60L)).cast("string"), 2, "0")
      val mm = lpad(pmod(col("doc_id"), lit(10L)).cast("string"), 2, "0")
      val vtt = concat(
        lit("WEBVTT\n\nNOTE generated fixture\n\n"),
        lit("00:00:"), ss, lit(".000 --> 00:00:"), ss,
        lit(".900\nFirst cue for doc "), col("doc_id").cast("string"),
        lit(".\n\n"),
        lit("00:"), mm, lit(":10.500 --> 00:"), mm,
        lit(":12.750\nSecond cue line one.\nLine two."))
      TextAnalysis.vttParse(
          t(s, dir, "documents").select(col("doc_id"), vtt.as("vtt")))
        .orderBy("doc_id", "block_pos")
    }),
    // speaker-turn extraction: dotted speaker labels, narrative lines
    // skipped, utterance word counts — each turn derived arithmetically
    "q212_dialogue_turns" -> ((s, dir) => {
      val text = concat_ws("\n",
        concat(lit("Host: Welcome to episode "), col("doc_id").cast("string"),
          lit(".")),
        lit("(applause)"),
        lit("Dr. Gray: Thanks for having me."),
        concat(lit("Host: Question "), pmod(col("doc_id"), lit(7L)).cast("string"),
          lit(" coming up.")))
      TextAnalysis.dialogueTurns(
          t(s, dir, "documents").select(col("doc_id"), text.as("text")))
        .orderBy("doc_id", "turn_pos")
    }),
    // markdown structure census over planted pages (header lines, an
    // unterminated trailing fence on doc_id%3==0, one link) — the
    // oracle replays the fence-parity trick
    "q213_markdown_stats" -> ((s, dir) => {
      val md = concat(
        lit("# Title\n\nSome intro with a [link](https://x.io/"),
        col("doc_id").cast("string"), lit(").\n\n"),
        lit("## Section\n\n```\n"), substring(col("text"), 1, 30),
        lit("\n```\n\ntail "),
        when(pmod(col("doc_id"), lit(3L)) === 0,
          lit("```unterminated code")).otherwise(lit("plain end")))
      TextAnalysis.markdownStats(
          t(s, dir, "documents").select(col("doc_id"), md.as("text")))
        .orderBy("doc_id")
    }),
    // HITS on the arithmetic domain graph (every site links its ext
    // target and the shared CDN): cdn becomes the top authority,
    // sites are pure hubs — exact integer path counts after 2 rounds
    "q210_hits_scores" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      def site = concat(lit("site"),
        pmod(col("doc_id"), lit(7L)).cast("string"))
      val e1 = d.select(site.as("src"),
        concat(lit("ext"), pmod(col("doc_id"), lit(5L)).cast("string")).as("dst"))
      val e2 = d.select(site.as("src"), lit("cdn").as("dst"))
      Dedup.hitsScores(e1.unionByName(e2)).orderBy("id")
    }),
    // FLAC STREAMINFO round-trip: the packed 64-bit field (20-bit
    // sample rate, 3-bit channels, 5-bit bps, 36-bit total samples)
    // built as ONE shifted integer, recovered bit-exactly
    "q208_flac_meta" -> ((s, dir) => {
      def be(c: Column, n: Int) = lpad(hex(c), 2 * n, "0")
      val sr = (col("n_chars") % 48000 + 8000).cast("long")
      val ch1 = pmod(col("doc_id"), lit(8L))
      val bps1 = when(pmod(col("doc_id"), lit(2L)) === 0, lit(15L))
        .otherwise(lit(23L))
      val total = col("n_chars").cast("long") * 1000L
      val packed = shiftleft(sr, 44) + shiftleft(ch1, 41) +
        shiftleft(bps1, 36) + total
      val minbs = (col("n_chars") % 4096 + 16).cast("long")
      val hexStr = concat(lit("664C6143" + "80" + "000022"),
        be(minbs, 2), be(minbs, 2), lit("000000" + "000000"),
        be(packed, 8), lit("0" * 32))
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), unhex(hexStr).as("payload"))
      Multimodal.containerMeta(media, Seq("flac"))
        .select(col("media_id"), col("n_bytes"),
          col("flac.min_block").as("min_block"),
          col("flac.max_block").as("max_block"),
          col("flac.sample_rate").as("sample_rate"),
          col("flac.channels").as("channels"),
          col("flac.bits_per_sample").as("bits_per_sample"),
          col("flac.total_samples").as("total_samples"))
        .orderBy("media_id")
    }),
    // MP3 frame headers behind a VARIABLE-size ID3v2 tag (synchsafe
    // size) on even docs — bitrate/samplerate table indices and the
    // channel mode rotate through every legal value
    "q209_mp3_meta" -> ((s, dir) => {
      def be(c: Column, n: Int) = lpad(hex(c), 2 * n, "0")
      val k = pmod(col("doc_id"), lit(40L))
      val hasId3 = pmod(col("doc_id"), lit(2L)) === 0
      val id3 = concat(lit("494433" + "0400" + "00" + "000000"), be(k, 1),
        lit("0" * 80).substr(lit(1), k * 2))
      val brIdx = pmod(col("doc_id"), lit(14L)) + 1L
      val srIdx = pmod(col("doc_id"), lit(3L))
      val b3 = shiftleft(brIdx, 4) + shiftleft(srIdx, 2)
      val b4 = shiftleft(pmod(col("doc_id"), lit(4L)), 6)
      val hexStr = concat(when(hasId3, id3).otherwise(lit("")),
        lit("FFFB"), be(b3, 1), be(b4, 1), lit("00000000"))
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), unhex(hexStr).as("payload"))
      Multimodal.containerMeta(media, Seq("mp3"))
        .select(col("media_id"),
          col("mp3.bitrate_kbps").as("bitrate_kbps"),
          col("mp3.sample_rate").as("sample_rate"),
          col("mp3.channel_mode").as("channel_mode"),
          col("mp3.has_id3").as("has_id3"))
        .orderBy("media_id")
    }),
    // HEIF/AVIF dims: ftyp brand (avif/heic by parity) + meta full-box
    // descent past a VARIABLE free box to iprp/ipco/ispe — the walk
    // must honor meta's +12 version/flags offset; oracle arithmetic
    "q206_heif_meta" -> ((s, dir) => {
      val wv = (col("n_chars") % 640 + 1).cast("long")
      val hv = (col("n_chars") % 480 + 1).cast("long")
      val k = pmod(col("doc_id"), lit(5L))
      val isAvif = pmod(col("doc_id"), lit(2L)) === 0
      def be(c: Column, n: Int) = lpad(hex(c), 2 * n, "0")
      val brandHex = when(isAvif, lit("61766966")).otherwise(lit("68656963"))
      val ftyp = concat(lit("00000014" + "66747970"), brandHex,
        lit("00000000" + "6D696631"))
      val ispe = concat(lit("00000014" + "69737065" + "00000000"),
        be(wv, 4), be(hv, 4))
      val ipco = concat(lit("00000024" + "6970636F" +
        "00000008" + "66726565"), ispe)
      val iprp = concat(lit("0000002C" + "69707270"), ipco)
      val free1 = concat(be(k + 8, 4), lit("66726565"),
        lit("00000000").substr(lit(1), k * 2))
      val meta = concat(be(k + 64, 4), lit("6D657461" + "00000000"),
        free1, iprp)
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          unhex(concat(ftyp, meta)).as("payload"))
        .localCheckpoint()
      Multimodal.containerMeta(media, Seq("heif"))
        .select(col("media_id"), col("n_bytes"), col("heif.brand").as("brand"),
          col("heif.width").as("width"), col("heif.height").as("height"))
        .orderBy("media_id")
    }),
    // mdat-grain MP4 fingerprint: same sample data behind different
    // free-box padding must fingerprint identically — the oracle
    // predicts md5(text) while every header byte drops out
    "q207_mp4_fingerprint" -> ((s, dir) => {
      val k = pmod(col("doc_id"), lit(5L))
      def be(c: Column, n: Int) = lpad(hex(c), 2 * n, "0")
      val free = concat(be(k + 8, 4), lit("66726565"),
        lit("00000000").substr(lit(1), k * 2))
      val mdat = concat(be(octet_length(col("text")).cast("long") + 8L, 4),
        lit("6D646174"), hex(col("text").cast("binary")))
      val hexStr = concat(lit("00000010" + "66747970" + "69736F6D" + "00000200"),
        free, mdat)
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), unhex(hexStr).as("payload"))
        .localCheckpoint()
      Multimodal.payloadFingerprint(media).orderBy("media_id")
    }),
    // format-aware payload fingerprint: a FULL synthesized PNG whose
    // tEXt chunk varies by source but whose IDAT stream is the text
    // bytes — the fingerprint must hash ONLY the IDAT content, so the
    // oracle predicts it as md5(text) while the ancillary chunk and
    // headers drop out
    "q161_payload_fingerprint" -> ((s, dir) => {
      val w = (col("n_chars") % 640 + 1).cast("int")
      val h = (col("n_chars") % 480 + 1).cast("int")
      val src = col("source").cast("binary")
      val txt = col("text").cast("binary")
      def chunk(tagHex: String, data: Column) = concat(
        unhex(lpad(hex(length(data)), 8, "0")), unhex(lit(tagHex)),
        data, unhex(lit("00000000"))) // CRC present but unvalidated
      val payload = concat(
        unhex(lit("89504E470D0A1A0A")),                  // signature
        unhex(concat(lit("0000000D49484452"),
          lpad(hex(w), 8, "0"), lpad(hex(h), 8, "0"),
          lit("080200000000000000"))),                   // IHDR + CRC
        chunk("74455874", src),                          // tEXt (ancillary)
        chunk("49444154", txt),                          // IDAT
        unhex(lit("0000000049454E4400000000")))          // IEND
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), payload.as("payload"))
      Multimodal.payloadFingerprint(media)
        .select(col("media_id"), col("n_bytes"), col("format"), col("fingerprint"))
        .orderBy("media_id")
    }),
    // token-distribution PSI between the src1* slice and the rest —
    // the vocabulary-drift alarm q126's length histogram can't ring
    "q154_token_drift" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Corpus.tokenDrift(
        base = docs.filter(!col("source").startsWith("src1")),
        current = docs.filter(col("source").startsWith("src1")))
        .orderBy("bucket")
    }),
    // embedding-space decontamination: corpus vectors cosine-matching
    // any eval vector — paraphrase-level leakage q64's n-grams miss;
    // eval side broadcast, corpus never shuffled
    "q140_semantic_decon" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.semanticDecontaminate(
        emb.filter(col("vec_id") % 20 =!= 0),
        emb.filter(col("vec_id") % 20 === 0),
        threshold = 0.25, planes = 4, dim = 64)
        .orderBy("corpus_id")
    }),
    // mutual-kNN semantic clustering: bucketed top-k graph, edges kept
    // only where reciprocated (hub filter), components → cluster label
    "q139_knn_clusters" -> ((s, dir) =>
      Similarity.mutualKnnClusters(t(s, dir, "embeddings"),
        k = 3, planes = 4, dim = 64)
        .orderBy("vec_id")),
    // deterministic hash-stratified sampling: per-label fractions with
    // no RNG — reproducible across runs/engines/partitionings
    "q53_stratified_sample" -> ((s, dir) =>
      TextAnalysis.stratifiedSample(t(s, dir, "embeddings"), "label", "vec_id",
        fractions = Map("0" -> 0.75, "1" -> 0.5), defaultFraction = 0.25)
        .select("vec_id", "label")
        .orderBy("vec_id")),
    // sign-bucketed near-dup — the scale path of q30: candidate pairs
    // per LSH bucket, never the all-pairs cross product
    "q49_neardup_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").filter(col("vec_id") % 4 === 0)
      Similarity.nearDupPairsLsh(emb, threshold = -2.0, planes = 4, dim = 64)
        .orderBy(col("sim").desc, col("id_a"), col("id_b"))
        .limit(20)
    }),
    // SemDeDup-style embedding-space dedup end to end: sign-bucketed
    // cosine pairs → connected components → keep min-id representative
    "q88_semantic_dedup" -> ((s, dir) =>
      Similarity.semanticDedup(t(s, dir, "embeddings"),
          threshold = 0.4, planes = 4, dim = 64)
        .select("vec_id", "label")
        .orderBy("vec_id")),
    // k-NN label classification: majority vote of the 5 exact nearest
    // neighbors, ties toward the smallest label
    "q71_knn_classify" -> ((s, dir) =>
      Similarity.knnClassify(t(s, dir, "embeddings"),
        queryIds = Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L), k = 5)
        .orderBy("query_id")),
    // Johnson–Lindenstrauss random projection 64 → 8 dims with the
    // deterministic md5 plane family; scalar (id, dim, value) rows
    "q72_random_projection" -> ((s, dir) =>
      Similarity.randomProject(t(s, dir, "embeddings"), outDim = 8, dim = 64)
        .orderBy("vec_id", "dim")),
  )

  private def eventQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_events_tumbling" -> ((s, dir) =>
      EventStreams.tumbling(t(s, dir, "events"))
        .orderBy("win_start", "event_type")),
    "q32_events_sessions" -> ((s, dir) =>
      EventStreams.sessions(t(s, dir, "events"))
        .orderBy("user_id", "session_start")),
    "q36_events_sliding" -> ((s, dir) =>
      EventStreams.sliding(t(s, dir, "events"))
        .orderBy("win_start", "event_type")),
    "q37_distinct_users" -> ((s, dir) =>
      EventStreams.userCounts(t(s, dir, "events"))
        .orderBy("event_type")),
    // HLL sketch, cross-checked: the estimate is engine-specific, so
    // the oracle-checkable columns are the exact count plus the bound
    // that the sketch landed within 5% of it
    "q38_approx_distinct" -> ((s, dir) =>
      EventStreams.approxUserCountsChecked(t(s, dir, "events"))
        .orderBy("event_type")),
    "q45_asof_join" -> ((s, dir) =>
      EventStreams.asofJoin(t(s, dir, "events"), "error", "signup")
        .orderBy("user_id", "left_id")),
    "q44_interval_join" -> ((s, dir) =>
      EventStreams.intervalJoin(t(s, dir, "events"), "click", "purchase")
        .orderBy("user_id", "left_id", "right_id")),
    // earliest-event dedup per (user, type) — batch form of the
    // watermark-bounded streaming dedup (dropDuplicatesWithinWatermark)
    "q57_events_dedup" -> ((s, dir) =>
      EventStreams.dedupEvents(t(s, dir, "events"), Seq("user_id", "event_type"))
        .select("user_id", "event_type", "event_id")
        .orderBy("user_id", "event_type")),
    "q33_events_json" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          (sum(col("k")).cast("double") / count(col("k"))).as("avg_k"))
        .orderBy("event_type")),
    // ordered conversion funnel: stage k+1 counts only events strictly
    // after the user's first stage-k event
    "q67_funnel" -> ((s, dir) =>
      EventStreams.funnel(t(s, dir, "events"), Seq("view", "click", "purchase"))
        .orderBy("stage_idx")),
    // per-type window-count anomaly score: integer moments (exact,
    // order-free) then pure IEEE mean/var/z — engine-portable doubles
    "q73_window_zscore" -> ((s, dir) =>
      EventStreams.windowZscore(t(s, dir, "events"))
        .orderBy("event_type", "win_start")),
  )

  private def miscQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // one (media_id, n_bytes, pos, feature) row per histogram bin —
    // scalar columns for the comparator; the fixture payloads are ASCII
    // text bytes, so the byte histogram is SQL-expressible too
    "q34_multimodal_features" -> ((s, dir) =>
      Multimodal.extractFeatures(Multimodal.fromDocuments(t(s, dir, "documents")))
        .select(col("media_id"), col("n_bytes"),
          posexplode(col("features")).as(Seq("pos", "feature")))
        .select(col("media_id"), col("n_bytes"),
          col("pos").cast("long").as("pos"), col("feature"))
        .orderBy("media_id", "pos")),
    // container-header parsing round-trip: synthesize REAL PNG bytes
    // (signature + IHDR) per doc, then recover the fields from the
    // binary with the builtin-only parser — the oracle derives the
    // expected values arithmetically
    "q76_container_meta" -> ((s, dir) => {
      val w = (col("n_chars") % 640 + 1).cast("int")
      val h = (col("n_chars") % 480 + 1).cast("int")
      val payload = unhex(concat(
        lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
        lpad(hex(w), 8, "0"), lpad(hex(h), 8, "0"), lit("0802000000")))
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), payload.as("payload"))
      Multimodal.containerMeta(media, Seq("png"))
        .select(col("media_id"), col("n_bytes"),
          col("png.width").as("width"), col("png.height").as("height"),
          col("png.bit_depth").as("bit_depth"), col("png.color_type").as("color_type"))
        .orderBy("media_id")
    }),
    // JPEG frame-header parsing: the payload is synthesized with a
    // VARIABLE-length comment segment before the SOF0, so the parser
    // must walk the marker-segment chain (pos → pos + 2 + len), not
    // read fixed offsets — the oracle recomputes the builder formulas
    "q116_jpeg_meta" -> ((s, dir) => {
      val w = (col("n_chars") % 640 + 1).cast("long")
      val h = (col("n_chars") % 480 + 1).cast("long")
      val comLen = (col("n_chars") % 7 + 1).cast("int") // comment bytes
      val payload = unhex(concat(
        lit("FFD8"),                                    // SOI
        lit("FFFE"), lpad(hex(comLen + 2), 4, "0"),     // COM, var length
        expr("rpad('', int((n_chars % 7 + 1) * 2), '41')"), // comment body
        lit("FFDB0005000000"),                          // DQT stub
        lit("FFC00011" + "08"),                         // SOF0, len 17, prec 8
        lpad(hex(h), 4, "0"), lpad(hex(w), 4, "0"),
        lit("03" + "010011" + "020011" + "030011"),     // 3 components
        lit("FFD9")))                                   // EOI
      val media = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), payload.as("payload"))
      Multimodal.containerMeta(media, Seq("jpeg"))
        .select(col("media_id"),
          col("jpeg.width").as("width"), col("jpeg.height").as("height"),
          col("jpeg.precision").as("precision"),
          col("jpeg.n_components").as("n_components"))
        .orderBy("media_id")
    }),
    "q35_catalog_tables" -> ((s, dir) => {
      val cat = new SchemaCatalog(s, dir)
      // tableDefs fans the footer reads out in parallel — the serial
      // per-table spark.read loop would crawl on a wide lake
      val rows = cat.tableDefs.map { d =>
        (d.name, d.schema.fields.length, d.pk.orNull)
      }
      import s.implicits._
      rows.toDF("table_name", "n_columns", "pk").orderBy("table_name")
    }),
  )

  /** DuckDB-equivalent SQL per query (same column names, same ordering,
    * same DECIMAL(18,4) money arithmetic). Every query has an oracle:
    * q39's deterministic quantizer makes the full IVF pipeline
    * SQL-expressible; the KMeans form's contract is q58. */
  def oracleSql: Map[String, String] = coreOracleSql ++ extOracleSql

  private def coreOracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_inlist_scan" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |  l_quantity, l_extendedprice, l_returnflag, l_shipdate
        |FROM lineitem
        |WHERE l_orderkey IN (1, 7, 32, 66, 97, 128, 193, 256)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_copy_tree" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
        |FROM lineitem
        |WHERE l_orderkey IN (
        |  SELECT o_orderkey FROM orders WHERE o_custkey IN (
        |    SELECT c_custkey FROM customer WHERE c_custkey BETWEEN 1 AND 10))
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q55_composite_walk" ->
      """SELECT DISTINCT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber
        |FROM lineitem
        |WHERE l_orderkey IN (
        |  SELECT o_orderkey FROM orders WHERE o_custkey IN (
        |    SELECT c_custkey FROM customer WHERE c_custkey BETWEEN 1 AND 10))
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q04_delete_tree" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |FROM orders
        |WHERE o_orderkey NOT IN (
        |  SELECT o_orderkey FROM orders WHERE o_custkey IN (
        |    SELECT c_custkey FROM customer WHERE c_custkey BETWEEN 1 AND 10))
        |ORDER BY o_orderkey""".stripMargin,

    "q05_semi_join" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0)
        |ORDER BY o_orderkey""".stripMargin,

    "q06_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 10""".stripMargin,

    "q07_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  ROW_NUMBER() OVER w AS rn,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q08_rollup" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_sales,
        |  COUNT(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,

    "q10_join_revenue" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    "q09_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        |ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin,

    "q11_except" ->
      """SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |EXCEPT
        |SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,

    "q12_union" ->
      """SELECT c_custkey FROM customer WHERE c_nationkey IN (1, 2)
        |UNION
        |SELECT c_custkey FROM customer WHERE c_acctbal > 9500.0
        |ORDER BY c_custkey""".stripMargin,

    "q13_upsert_merge" ->
      """WITH base AS (
        |  SELECT c_custkey AS pk, c_name AS name, c_acctbal AS bal
        |  FROM customer WHERE c_custkey <= 100),
        |delta AS (
        |  SELECT c_custkey AS pk, 'u_' || c_name AS name, c_acctbal + 1000.0 AS bal
        |  FROM customer WHERE c_custkey BETWEEN 51 AND 150)
        |SELECT pk, name, bal FROM delta
        |UNION ALL
        |SELECT pk, name, bal FROM base WHERE pk NOT IN (SELECT pk FROM delta)
        |ORDER BY pk""".stripMargin,

    "q14_delete_pk" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer
        |WHERE c_custkey NOT BETWEEN 1 AND 25
        |ORDER BY c_custkey""".stripMargin,

    "q15_pivot" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
  )

  // shared oracle-SQL fragments for the token-based queries
  /** q103's "trained" classifier coefficients: a deterministic spread
    * of multiples of 1/64 in [-1, 1) — the binary grid that makes
    * hashed-bag sums exact (order-free) in any engine. */
  private val linearScoreWeights: Seq[Double] =
    (0 until 64).map(j => ((j * 37) % 129 - 64) / 64.0)

  private val tokCte =
    """toks AS (
      |  SELECT doc_id, tok FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  WHERE tok <> '')""".stripMargin
  private val shingleCte =
    """sh AS (
      |  SELECT doc_id, unnest(list_transform(
      |    generate_series(1, len(tl) - 2),
      |    i -> array_to_string(tl[i:i+2], ' '))) AS sh
      |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tl
      |        FROM documents))""".stripMargin

  private def extOracleSql: Map[String, String] = Map(
    // S3/S4 catalog scans: the comparator registers one DuckDB view per
    // parquet table, so information_schema sees exactly the catalog the
    // Spark side reads from parquet footers. The pk CASE inlines the
    // same starPks fixture constants SchemaCatalog ships (config, not
    // computation) — the cross-engine content is the table list and
    // per-table column counts.
    "q35_catalog_tables" ->
      """SELECT table_name,
        |  CAST(COUNT(*) AS INTEGER) AS n_columns,
        |  CASE table_name
        |    WHEN 'region' THEN 'r_regionkey'
        |    WHEN 'nation' THEN 'n_nationkey'
        |    WHEN 'customer' THEN 'c_custkey'
        |    WHEN 'supplier' THEN 's_suppkey'
        |    WHEN 'part' THEN 'p_partkey'
        |    WHEN 'orders' THEN 'o_orderkey'
        |  END AS pk
        |FROM information_schema.columns
        |GROUP BY table_name
        |ORDER BY table_name""".stripMargin,

    // exact side of the HLL cross-check; hll_ok is the Spark-side
    // assertion that the sketch landed within tolerance
    "q38_approx_distinct" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |  COUNT(DISTINCT user_id) AS n_users, TRUE AS hll_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // the IVF contract: k hits per query, all genuine near neighbors
    // (the Spark side brute-forces the exact top max(40, 5%) to check)
    "q58_ann_ivf_recall" ->
      """SELECT vec_id AS query_id, CAST(3 AS BIGINT) AS n_hits,
        |  TRUE AS all_hits_near
        |FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)
        |ORDER BY query_id""".stripMargin,
    // same contract over the composed trained IVF-PQ path (ADC-scored,
    // so the Spark-side brute-force band is max(80, 10%))
    "q102_ivfpq_recall" ->
      """SELECT vec_id AS query_id, CAST(3 AS BIGINT) AS n_hits,
        |  TRUE AS all_hits_near
        |FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)
        |ORDER BY query_id""".stripMargin,
    "q20_token_stats" ->
      s"""WITH $tokCte
         |SELECT d.doc_id,
         |  length(d.text) AS n_chars,
         |  count(*) AS n_tokens,
         |  count(DISTINCT tok) AS n_distinct,
         |  CAST(SUM(length(tok)) AS DOUBLE) / count(*) AS avg_token_len,
         |  CAST(count(DISTINCT tok) AS DOUBLE) / count(*) AS type_token_ratio
         |FROM documents d JOIN toks USING (doc_id)
         |GROUP BY d.doc_id, d.text
         |ORDER BY d.doc_id""".stripMargin,

    "q21_lang_guess" -> langGuessSql,
    "q22_quality_score" ->
      s"""WITH $tokCte,
         |stats AS (
         |  SELECT doc_id,
         |    count(*) AS n_tokens,
         |    CAST(count(DISTINCT tok) AS DOUBLE) / count(*) AS ttr,
         |    CAST(SUM(length(tok)) AS DOUBLE) / count(*) AS avg_len
         |  FROM toks GROUP BY doc_id)
         |SELECT doc_id,
         |  least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
         |    + ttr * 0.3
         |    + least(avg_len / 8.0, 1.0) * 0.3 AS quality
         |FROM stats ORDER BY doc_id""".stripMargin,

    "q23_fingerprint" ->
      s"""WITH $tokCte
         |SELECT doc_id, md5(string_agg(DISTINCT tok, ' ' ORDER BY tok)) AS fingerprint
         |FROM toks GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q40_scrub" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS clean
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q41_train_test_split" ->
      """SELECT CASE WHEN strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < 13
        |  THEN 'train' ELSE 'test' END AS split, count(*) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY split""".stripMargin,

    "q42_repetition" ->
      s"""WITH $shingleCte,
         |cnt AS (SELECT doc_id, sh, count(*) AS c FROM sh GROUP BY doc_id, sh)
         |SELECT doc_id, CAST(max(c) AS DOUBLE) / SUM(c) AS repetition,
         |  CAST(SUM(c) AS BIGINT) AS n_shingles
         |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q43_length_histogram" ->
      """SELECT CAST(FLOOR(n_chars / 200.0) AS BIGINT) AS bucket, count(*) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q24_exact_dedup" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY content_hash""".stripMargin,

    "q25_minhash_sig" ->
      s"""WITH $shingleCte
         |SELECT doc_id,
         |  ${(0 until 6).map(i => s"min(substr(md5(sh), ${1 + 5 * i}, 5)) AS mh$i").mkString(",\n  ")}
         |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q26_simhash" -> simhashSql,

    "q27_jaccard_topk" ->
      """WITH tl AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tl
        |  FROM documents WHERE doc_id % 5 = 0),
        |sh AS (
        |  SELECT DISTINCT doc_id, sh FROM (
        |    SELECT doc_id, unnest(list_transform(
        |      generate_series(1, len(tl) - 2),
        |      i -> array_to_string(tl[i:i+2], ' '))) AS sh
        |    FROM tl)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT doc_a, doc_b, sa.n AS n_a, sb.n AS n_b, n_shared,
        |  CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared) AS jaccard
        |FROM pairs
        |JOIN sizes sa ON sa.doc_id = doc_a
        |JOIN sizes sb ON sb.doc_id = doc_b
        |ORDER BY jaccard DESC, doc_a, doc_b LIMIT 20""".stripMargin,

    "q28_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
        |      FROM embeddings),
        |s AS (SELECT query_id, neighbor_id, list_dot_product(qv, cv) AS sim
        |      FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY sim DESC, neighbor_id) AS rnk FROM s)
        |SELECT query_id, neighbor_id, sim, rnk FROM r WHERE rnk <= 5
        |ORDER BY query_id, rnk""".stripMargin,

    "q46_label_centroids" ->
      """SELECT label, CAST(i - 1 AS BIGINT) AS pos,
        |  CAST(SUM(CAST(FLOOR(v * 16777216.0) AS BIGINT)) AS DOUBLE)
        |    / COUNT(*) / 16777216.0 AS m
        |FROM (SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS v,
        |        generate_subscripts(embedding, 1) AS i
        |      FROM embeddings)
        |GROUP BY label, i
        |ORDER BY label, pos""".stripMargin,

    // q46's exact-integer centroid reassembled into an ordered list,
    // cosine in array order (list_dot_product ≡ the native dot's
    // left-to-right sum — the q88 precedent)
    "q123_centroid_outliers" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |m AS (SELECT label, i,
        |        CAST(SUM(CAST(FLOOR(v * 16777216.0) AS BIGINT)) AS DOUBLE)
        |          / COUNT(*) / 16777216.0 AS m
        |      FROM (SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS v,
        |              generate_subscripts(embedding, 1) AS i
        |            FROM embeddings)
        |      GROUP BY label, i),
        |c AS (SELECT label, list(m ORDER BY i) AS cv FROM m GROUP BY label),
        |s AS (SELECT vec_id, e.label AS label,
        |        list_dot_product(v, cv)
        |          / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv)))
        |          AS cos_centroid
        |      FROM e JOIN c ON e.label = c.label)
        |SELECT vec_id, label, cos_centroid, cos_centroid < 0.0 AS is_outlier
        |FROM s ORDER BY vec_id""".stripMargin,

    // hard negatives: q28's cross-scan with a label-inequality
    // predicate and full cosine (mining must be magnitude-invariant)
    "q124_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS query_id, label AS ql,
        |             CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS neighbor_id, label AS neg_label,
        |        CAST(embedding AS DOUBLE[]) AS cv
        |      FROM embeddings),
        |s AS (SELECT query_id, neighbor_id, neg_label,
        |        list_dot_product(qv, cv)
        |          / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
        |          AS sim
        |      FROM q CROSS JOIN c WHERE ql <> neg_label),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |        ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk FROM s)
        |SELECT query_id, neighbor_id, neg_label, sim, rnk FROM r WHERE rnk <= 5
        |ORDER BY query_id, rnk""".stripMargin,

    // Flesch: identical association (206.835 − a) − b, counts cast to
    // DOUBLE before each division, one 9-dp round
    "q129_readability" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS tl
        |  FROM documents),
        |m AS (SELECT doc_id,
        |    CAST(len(tl) AS BIGINT) AS n_words,
        |    CAST(len(list_filter(list_transform(
        |      regexp_extract_all(text, '[^.!?]+[.!?]*'), s -> trim(s)),
        |      s -> s <> '')) AS BIGINT) AS n_sents,
        |    CAST(list_sum(list_transform(tl,
        |      x -> greatest(1, len(regexp_extract_all(lower(x), '[aeiouy]+')))))
        |      AS BIGINT) AS n_syllables
        |  FROM t)
        |SELECT doc_id, n_words, n_sents, n_syllables,
        |  round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sents)
        |    - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 9) AS flesch
        |FROM m WHERE n_words > 0 AND n_sents > 0
        |ORDER BY doc_id""".stripMargin,

    // AUC: q22 quality scores at 1000-bucket resolution, 2x rank-sum
    // in exact integers, one double division at the end
    "q135_auc" ->
      s"""WITH $tokCte,
         |stats AS (
         |  SELECT doc_id, count(*) AS n_tokens,
         |    CAST(count(DISTINCT tok) AS DOUBLE) / count(*) AS ttr,
         |    CAST(SUM(length(tok)) AS DOUBLE) / count(*) AS avg_len
         |  FROM toks GROUP BY doc_id),
         |q AS (SELECT d.doc_id,
         |    CASE WHEN d.source LIKE 'src1%' THEN 1 ELSE 0 END AS y,
         |    least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
         |      + ttr * 0.3 + least(avg_len / 8.0, 1.0) * 0.3 AS quality
         |  FROM stats JOIN documents d ON d.doc_id = stats.doc_id),
         |g AS (SELECT least(CAST(FLOOR(quality * 1000) AS BIGINT), 999) AS b,
         |        CAST(SUM(y) AS BIGINT) AS np, count(*) AS n
         |      FROM q GROUP BY 1),
         |r AS (SELECT np, n,
         |        SUM(n) OVER (ORDER BY b) - n AS below FROM g),
         |a AS (SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
         |        CAST(SUM(n - np) AS BIGINT) AS n_neg,
         |        CAST(SUM(np * (below * 2 + n + 1)) AS BIGINT) AS rp2
         |      FROM r)
         |SELECT n_pos, n_neg,
         |  (CAST(rp2 AS DOUBLE) / 2.0
         |    - CAST(n_pos AS DOUBLE) * (n_pos + 1) / 2.0)
         |    / (CAST(n_pos AS DOUBLE) * n_neg) AS auc
         |FROM a""".stripMargin,

    // calibration: the q22 quality expression, fixed 100-bucket
    // histogram CDF per source, mid-rank (below + c/2)/n in exact
    // integer counts
    "q131_calibrate_scores" ->
      s"""WITH $tokCte,
         |stats AS (
         |  SELECT doc_id, count(*) AS n_tokens,
         |    CAST(count(DISTINCT tok) AS DOUBLE) / count(*) AS ttr,
         |    CAST(SUM(length(tok)) AS DOUBLE) / count(*) AS avg_len
         |  FROM toks GROUP BY doc_id),
         |q AS (SELECT d.doc_id, d.source,
         |    least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
         |      + ttr * 0.3 + least(avg_len / 8.0, 1.0) * 0.3 AS quality
         |  FROM stats JOIN documents d ON d.doc_id = stats.doc_id),
         |wb AS (SELECT doc_id, source, quality,
         |    least(CAST(FLOOR(quality * 100) AS BIGINT), 99) AS b FROM q),
         |hist AS (SELECT source, b, count(*) AS c FROM wb GROUP BY 1, 2),
         |cdf AS (SELECT source, b, c,
         |    SUM(c) OVER (PARTITION BY source ORDER BY b) - c AS below,
         |    SUM(c) OVER (PARTITION BY source) AS n
         |  FROM hist)
         |SELECT wb.doc_id, wb.source, wb.quality,
         |  (below + 0.5 * c) / n AS calibrated
         |FROM wb JOIN cdf ON wb.source = cdf.source AND wb.b = cdf.b
         |ORDER BY doc_id""".stripMargin,

    // PMI assembled in DOUBLE in the identical association
    // (c12·N) / (c1·c2), ln rounded once to 9 dp
    "q130_collocations" ->
      """WITH t AS (
        |  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS tl
        |  FROM documents),
        |occ AS (SELECT unnest(tl) AS tok FROM t),
        |uni AS (SELECT tok, count(*) AS c FROM occ GROUP BY 1),
        |ntot AS (SELECT count(*) AS N FROM occ),
        |b AS (SELECT unnest(list_transform(
        |    generate_series(1, len(tl) - 1),
        |    i -> {'t1': tl[i], 't2': tl[i + 1]})) AS bg FROM t),
        |pc AS (SELECT bg.t1 AS t1, bg.t2 AS t2, count(*) AS c12
        |       FROM b GROUP BY 1, 2),
        |f AS (SELECT t1, t2, c12 FROM pc WHERE c12 >= 5),
        |s AS (SELECT t1, t2, c12,
        |        round(ln((CAST(c12 AS DOUBLE) * N)
        |          / (CAST(u1.c AS DOUBLE) * u2.c)), 9) AS pmi
        |      FROM f JOIN uni u1 ON u1.tok = f.t1
        |      JOIN uni u2 ON u2.tok = f.t2 CROSS JOIN ntot)
        |SELECT t1, t2, c12, pmi FROM s
        |ORDER BY pmi DESC, t1, t2 LIMIT 50""".stripMargin,

    // PSI: Laplace-smoothed shares from exact counts, ln rounded once
    // to 9 dp (the repo's transcendental recipe)
    "q126_psi_drift" ->
      """WITH hb AS (
        |  SELECT CAST(FLOOR(n_chars / 200.0) AS BIGINT) AS bucket,
        |    count(*) AS n_base
        |  FROM documents WHERE source NOT LIKE 'src1%' GROUP BY 1),
        |hc AS (
        |  SELECT CAST(FLOOR(n_chars / 200.0) AS BIGINT) AS bucket,
        |    count(*) AS n_cur
        |  FROM documents WHERE source LIKE 'src1%' GROUP BY 1),
        |h AS (SELECT coalesce(hb.bucket, hc.bucket) AS bucket,
        |        coalesce(n_base, 0) AS n_base, coalesce(n_cur, 0) AS n_cur
        |      FROM hb FULL JOIN hc ON hb.bucket = hc.bucket),
        |tot AS (SELECT SUM(n_base) AS tb, SUM(n_cur) AS tc, count(*) AS nb FROM h)
        |SELECT bucket, n_base, n_cur,
        |  round((CAST(n_base + 1 AS DOUBLE) / (tb + nb)
        |         - CAST(n_cur + 1 AS DOUBLE) / (tc + nb))
        |    * round(ln((CAST(n_base + 1 AS DOUBLE) / (tb + nb))
        |               / (CAST(n_cur + 1 AS DOUBLE) / (tc + nb))), 9), 9)
        |    AS contrib
        |FROM h CROSS JOIN tot ORDER BY bucket""".stripMargin,

    // label-centroid pairwise cosine, q46 centroids, a < b
    "q127_label_confusion" ->
      """WITH m AS (SELECT label, i,
        |        CAST(SUM(CAST(FLOOR(v * 16777216.0) AS BIGINT)) AS DOUBLE)
        |          / COUNT(*) / 16777216.0 AS m
        |      FROM (SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS v,
        |              generate_subscripts(embedding, 1) AS i
        |            FROM embeddings)
        |      GROUP BY label, i),
        |c AS (SELECT label, list(m ORDER BY i) AS cv FROM m GROUP BY label)
        |SELECT a.label AS label_a, b.label AS label_b,
        |  list_dot_product(a.cv, b.cv)
        |    / (sqrt(list_dot_product(a.cv, a.cv)) * sqrt(list_dot_product(b.cv, b.cv)))
        |    AS cos
        |FROM c a JOIN c b ON a.label < b.label
        |ORDER BY label_a, label_b""".stripMargin,

    // waterfilling: first binding position over the ascending prefix
    // sums fixes the cap; double division is exact below 2^53
    "q128_source_caps" ->
      """WITH t AS (
        |  SELECT source, CAST(SUM(len(list_filter(string_split(text, ' '),
        |    x -> x <> ''))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |r AS (SELECT source, n_tokens,
        |        CAST(row_number() OVER (ORDER BY n_tokens, source) AS BIGINT) AS i,
        |        SUM(n_tokens) OVER (ORDER BY n_tokens, source) AS prefix,
        |        COUNT(*) OVER () AS S
        |      FROM t),
        |cap AS (SELECT min_by(CAST(FLOOR((24000 - (prefix - n_tokens))
        |                 / (S - i + 1)) AS BIGINT), i) AS cap
        |        FROM r
        |        WHERE prefix - n_tokens + (S - i + 1) * n_tokens >= 24000)
        |SELECT source, n_tokens,
        |  least(n_tokens, coalesce(cap, n_tokens)) AS alloc
        |FROM r CROSS JOIN cap ORDER BY source""".stripMargin,

    // temperature weights: sqrt (= n^0.5, correctly rounded in every
    // IEEE engine, unlike a general pow) rounded into DECIMAL so the
    // normalizing sum is order-free
    "q125_temperature_weights" ->
      """WITH t AS (
        |  SELECT source, CAST(SUM(len(list_filter(string_split(text, ' '),
        |    x -> x <> ''))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |s AS (SELECT source, n_tokens,
        |        CAST(round(sqrt(CAST(n_tokens AS DOUBLE)), 9) AS DECIMAL(28,9)) AS sq
        |      FROM t),
        |tot AS (SELECT SUM(sq) AS ts FROM s)
        |SELECT source, n_tokens,
        |  round(CAST(sq AS DOUBLE) / CAST(ts AS DOUBLE), 9) AS weight
        |FROM s CROSS JOIN tot ORDER BY source""".stripMargin,

    // payloads are UTF-8 bytes of ASCII fixture text, so byte value ==
    // code point and the byte histogram is expressible over substr
    // expected header fields derived arithmetically (the Spark side
    // does the real bytes round-trip; 29 = 8 sig + 25 IHDR bytes)
    "q76_container_meta" ->
      """SELECT doc_id AS media_id, CAST(29 AS BIGINT) AS n_bytes,
        |  CAST(n_chars % 640 + 1 AS INT) AS width,
        |  CAST(n_chars % 480 + 1 AS INT) AS height,
        |  CAST(8 AS INT) AS bit_depth, CAST(2 AS INT) AS color_type
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the builder formulas the JPEG marker-segment scan must invert
    "q116_jpeg_meta" ->
      """SELECT doc_id AS media_id,
        |  CAST(n_chars % 640 + 1 AS INT) AS width,
        |  CAST(n_chars % 480 + 1 AS INT) AS height,
        |  CAST(8 AS INT) AS precision, CAST(3 AS INT) AS n_components
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q34_multimodal_features" ->
      """WITH b AS (
        |  SELECT doc_id, unicode(substr(text, i, 1)) % 16 AS bin
        |  FROM (SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i
        |        FROM documents)),
        |c AS (SELECT doc_id, bin, count(*) AS cnt FROM b GROUP BY doc_id, bin),
        |g AS (SELECT d.doc_id, length(d.text) AS n_bytes, p.pos
        |      FROM documents d CROSS JOIN (SELECT unnest(range(16)) AS pos) p)
        |SELECT g.doc_id AS media_id, CAST(g.n_bytes AS BIGINT) AS n_bytes,
        |  CAST(g.pos AS BIGINT) AS pos,
        |  CASE WHEN g.n_bytes = 0 THEN 0.0
        |    ELSE coalesce(c.cnt, 0) / CAST(g.n_bytes AS DOUBLE) END AS feature
        |FROM g LEFT JOIN c ON c.doc_id = g.doc_id AND c.bin = g.pos
        |ORDER BY media_id, pos""".stripMargin,

    "q29_ann_lsh" -> annLshOracle,
    "q39_ann_ivf" -> annIvfOracle,
    "q109_ivf_append" -> annIvfOracleFor("5, 6, 7, 8, 9"),
    // delete ≡ rebuild-on-survivors: the oracle is the plain IVF probe
    // over the filtered corpus (centroids from survivor partials)
    "q134_ivf_delete" ->
      annIvfOracleFor("5, 6, 7, 8, 9", " WHERE vec_id % 7 <> 3"),
    "q81_pii_redact" -> piiOracle,
    "q82_containment" -> containmentOracle,
    "q83_content_chunks" -> contentChunksOracle,
    "q84_pq_codes" -> pqCodesOracle,
    "q85_pq_adc" -> pqAdcOracle,
    "q94_ivfpq" -> ivfPqOracle,
    "q49_neardup_lsh" -> neardupLshOracle,
    "q88_semantic_dedup" -> semanticDedupOracle,
    "q139_knn_clusters" -> mutualKnnClustersOracle,
    "q140_semantic_decon" -> semanticDeconOracle,
    // q145: same 2^24 integer-grid moments; mean*mean mirrors the
    // Spark expression order so the doubles are bit-identical
    "q145_dim_stats" ->
      """WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |x AS (SELECT unnest([{'d': i, 'x': v[i]}
        |                     FOR i IN range(1, len(v) + 1)]) AS s FROM e),
        |g AS (SELECT s.d - 1 AS dim, count(*) AS n,
        |        CAST(SUM(CAST(FLOOR(s.x * 16777216.0) AS BIGINT)) AS BIGINT) AS s1,
        |        CAST(SUM(CAST(FLOOR(s.x * s.x * 16777216.0) AS BIGINT)) AS BIGINT) AS s2
        |      FROM x GROUP BY 1)
        |SELECT CAST(dim AS BIGINT) AS dim, n,
        |  CAST(s1 AS DOUBLE) / n / 16777216.0 AS mean,
        |  greatest(CAST(s2 AS DOUBLE) / n / 16777216.0
        |    - (CAST(s1 AS DOUBLE) / n / 16777216.0) * (CAST(s1 AS DOUBLE) / n / 16777216.0),
        |    0.0) AS variance
        |FROM g ORDER BY dim""".stripMargin,
    "q48_lsh_candidates" -> lshCandidatesOracle,
    "q96_incremental_dedup" -> incrementalDedupOracle,
    "q75_editdist_neardup" -> editDistNearDupOracle,
    "q63_jaccard_estimate" -> jaccardEstimateOracle,
    "q50_dedup_components" -> dedupComponentsOracle,
    "q60_dedup_corpus" -> dedupCorpusOracle,
    "q143_dedup_best" -> dedupBestOracle,
    "q156_dedup_burden" -> dedupBurdenOracle,
    "q157_threshold_sweep" -> thresholdSweepOracle,
    "q120_cluster_split" -> clusterSplitOracle,
    "q132_cluster_stats" -> clusterStatsOracle,
    "q133_candidate_quality" -> candidateQualityOracle,
    "q52_simhash_neardup" -> simhashNearDupOracle,
    "q86_simhash64" -> simhash64Sql,
    "q87_simhash64_neardup" -> simhash64NearDupOracle,

    "q51_regex_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(regexp_extract_all(text, '\w+|[^\w\s]'))) AS BIGINT) AS n_distinct
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q53_stratified_sample" -> stratifiedSampleOracle,

    // corpus-level boilerplate 3-grams (distinct-doc frequency ≥ 5)
    "q65_boilerplate" ->
      s"""WITH $shingleCte,
         |d AS (SELECT DISTINCT doc_id, sh FROM sh)
         |SELECT sh AS ngram, CAST(count(*) AS BIGINT) AS n_docs
         |FROM d GROUP BY sh HAVING count(*) >= 5
         |ORDER BY n_docs DESC, ngram ASC LIMIT 30""".stripMargin,

    // 5-gram train/test leakage: per contaminated test doc, its count
    // of distinct shingles that appear anywhere in the train split
    // source-pair shingle Jaccard over 16-hex md5 shingle keys
    "q155_source_overlap" ->
      """WITH t AS (
        |  SELECT source, list_filter(string_split(text, ' '), x -> x <> '') AS tl
        |  FROM documents),
        |ss AS (
        |  SELECT DISTINCT source, substr(md5(sh), 1, 16) AS sh FROM (
        |    SELECT source, unnest(list_transform(
        |      generate_series(1, len(tl) - 2),
        |      i -> array_to_string(tl[i:i+2], ' '))) AS sh
        |    FROM t)),
        |sizes AS (SELECT source, count(*) AS n FROM ss GROUP BY 1),
        |shared AS (
        |  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
        |  FROM ss a JOIN ss b ON a.sh = b.sh AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT source_a, source_b, sa.n AS n_a, sb.n AS n_b, n_shared,
        |  CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared) AS jaccard
        |FROM shared
        |JOIN sizes sa ON sa.source = source_a
        |JOIN sizes sb ON sb.source = source_b
        |ORDER BY source_a, source_b""".stripMargin,

    "q64_decontamination" ->
      """WITH tl AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tl
        |  FROM documents),
        |sh5 AS (
        |  SELECT DISTINCT doc_id, substr(md5(sh), 1, 16) AS sh FROM (
        |    SELECT doc_id, unnest(list_transform(
        |      generate_series(1, len(tl) - 4),
        |      i -> array_to_string(tl[i:i+4], ' '))) AS sh
        |    FROM tl)),
        |lab AS (
        |  SELECT doc_id,
        |    CASE WHEN strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < 13
        |      THEN 'train' ELSE 'test' END AS split
        |  FROM documents),
        |tr AS (
        |  SELECT DISTINCT sh FROM sh5 JOIN lab USING (doc_id) WHERE split = 'train')
        |SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_contaminated
        |FROM sh5 s JOIN lab USING (doc_id) JOIN tr ON s.sh = tr.sh
        |WHERE lab.split = 'test'
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,

    // bloom-prefiltered decontamination: the filter is invisible to the
    // result, so the oracle is the plain exact chain at 4-gram width
    "q97_decontaminate_bloom" ->
      """WITH tl AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tl
        |  FROM documents),
        |sh4 AS (
        |  SELECT DISTINCT doc_id, substr(md5(sh), 1, 16) AS sh FROM (
        |    SELECT doc_id, unnest(list_transform(
        |      generate_series(1, len(tl) - 3),
        |      i -> array_to_string(tl[i:i+3], ' '))) AS sh
        |    FROM tl)),
        |lab AS (
        |  SELECT doc_id,
        |    CASE WHEN strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < 13
        |      THEN 'train' ELSE 'test' END AS split
        |  FROM documents),
        |tr AS (
        |  SELECT DISTINCT sh FROM sh4 JOIN lab USING (doc_id) WHERE split = 'train')
        |SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_contaminated
        |FROM sh4 s JOIN lab USING (doc_id) JOIN tr ON s.sh = tr.sh
        |WHERE lab.split = 'test'
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,

    // int8 quantization audit: scale, component sum, position-weighted
    // checksum, worst reconstruction error — floor (never round), all
    // arithmetic in double, so both engines produce identical bits
    "q66_quantize" ->
      """WITH v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (
        |  SELECT vec_id, v,
        |    list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
        |  FROM v),
        |q AS (
        |  SELECT vec_id, scale, v,
        |    CASE WHEN scale = 0.0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
        |      ELSE list_transform(v, x -> CAST(floor(x / scale) AS BIGINT)) END AS q
        |  FROM s)
        |SELECT vec_id, scale,
        |  CAST(list_sum(q) AS BIGINT) AS q_sum,
        |  CAST(list_sum(list_transform(generate_series(1, len(q)), i -> q[i] * i)) AS BIGINT) AS q_checksum,
        |  list_max(list_transform(generate_series(1, len(q)), i -> abs(v[i] - q[i] * scale))) AS max_err
        |FROM q ORDER BY vec_id""".stripMargin,

    // ordered conversion funnel over view → click → purchase
    "q67_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, date_trunc('microseconds', ts) AS ts
        |  FROM events),
        |s1 AS (SELECT user_id, min(ts) AS t FROM e WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM e
        |       JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
        |       WHERE e.event_type = 'click' GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM e
        |       JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
        |       WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS stage_idx, 'view' AS stage,
        |    (SELECT count(*) FROM s1) AS n_users
        |  UNION ALL SELECT CAST(2 AS BIGINT), 'click', (SELECT count(*) FROM s2)
        |  UNION ALL SELECT CAST(3 AS BIGINT), 'purchase', (SELECT count(*) FROM s3))
        |ORDER BY stage_idx""".stripMargin,

    "q54_chunking" ->
      """WITH tl AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tl
        |  FROM documents),
        |st AS (
        |  SELECT doc_id, tl, unnest(generate_series(1, len(tl), 40)) AS s1
        |  FROM tl WHERE len(tl) > 0)
        |SELECT doc_id, CAST((s1 - 1) // 40 AS BIGINT) AS chunk_id,
        |  array_to_string(tl[s1:s1+49], ' ') AS chunk,
        |  CAST(least(50, len(tl) - s1 + 1) AS BIGINT) AS n_tokens
        |FROM st ORDER BY doc_id, chunk_id""".stripMargin,

    "q56_salted_join" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q57_events_dedup" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id,
        |    date_trunc('microseconds', ts) AS ts
        |  FROM events),
        |r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        |  FROM e)
        |SELECT user_id, event_type, event_id FROM r WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin,

    "q62_vocab" ->
      s"""WITH $tokCte
         |SELECT tok AS token, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
         |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
         |FROM toks GROUP BY tok
         |ORDER BY n_occurrences DESC, token LIMIT 50""".stripMargin,

    "q61_sql_dot" ->
      """SELECT vec_id, label,
        |  list_dot_product(CAST(embedding AS DOUBLE[]),
        |                   CAST(embedding AS DOUBLE[])) AS norm_sq
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    // smoothed-idf TF-IDF: rank on the 6-decimal-rounded score, token
    // asc tie-break — identical in any engine with ln within 1 ulp
    "q68_tfidf" ->
      s"""WITH $tokCte,
         |tf AS (SELECT doc_id, tok AS token, count(*) AS tf
         |       FROM toks GROUP BY 1, 2),
         |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n FROM documents),
         |s AS (SELECT doc_id, token, tf, df,
         |        round(tf * (ln((n + 1.0) / (df + 1.0)) + 1.0), 6) AS tfidf
         |      FROM tf JOIN df USING (token), n),
         |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
         |        ORDER BY tfidf DESC, token) AS rnk FROM s)
         |SELECT doc_id, token, tf, df, tfidf, CAST(rnk AS BIGINT) AS rnk
         |FROM r WHERE rnk <= 5 ORDER BY doc_id, rnk""".stripMargin,

    // concat-then-chunk sequence packing: pure integer math (token
    // counts, running sums, floor-div by the 512-token budget)
    "q69_sequence_pack" ->
      """WITH d AS (
        |  SELECT source, doc_id % 8 AS shard, doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT *, COALESCE(SUM(n_tokens) OVER (
        |      PARTITION BY source, shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      // 512 AS chunk_id
        |  FROM d)
        |SELECT source, shard, CAST(chunk_id AS BIGINT) AS chunk_id,
        |  count(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1, 2, 3 ORDER BY source, shard, chunk_id""".stripMargin,

    // corpus-trained bigram LM: each ln rounded to 9 decimals before
    // the (exact) DECIMAL sum, so partition order cannot matter
    "q70_bigram_lm" ->
      """WITH b AS (
        |  SELECT doc_id, unnest(list_transform(
        |      generate_series(1, len(tl) - 1),
        |      i -> {'t1': tl[i], 't2': tl[i + 1]})) AS bg
        |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tl
        |        FROM documents)),
        |bg AS (SELECT doc_id, bg.t1 AS t1, bg.t2 AS t2 FROM b),
        |pc AS (SELECT t1, t2, count(*) AS c_pair FROM bg GROUP BY 1, 2),
        |pfx AS (SELECT t1, SUM(c_pair) AS c_prefix FROM pc GROUP BY 1),
        |m AS (SELECT t1, t2,
        |        CAST(round(ln(CAST(c_pair AS DOUBLE) / c_prefix), 9)
        |          AS DECIMAL(28,9)) AS lp
        |      FROM pc JOIN pfx USING (t1)),
        |s AS (SELECT doc_id, count(*) AS n_bigrams, SUM(lp) AS sm
        |      FROM bg JOIN m USING (t1, t2) GROUP BY 1)
        |SELECT doc_id, n_bigrams, CAST(sm AS DOUBLE) AS sum_logprob,
        |  CAST(sm AS DOUBLE) / n_bigrams AS avg_logprob
        |FROM s ORDER BY doc_id""".stripMargin,

    // KN probability assembled in the IDENTICAL association as the
    // Spark column expression (left-assoc products, every count forced
    // to DOUBLE before the arithmetic — DuckDB would otherwise run
    // `c - 0.75` in DECIMAL)
    "q118_kneser_ney" ->
      """WITH b AS (
        |  SELECT doc_id, unnest(list_transform(
        |      generate_series(1, len(tl) - 1),
        |      i -> {'t1': tl[i], 't2': tl[i + 1]})) AS bg
        |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tl
        |        FROM documents)),
        |bg AS (SELECT doc_id, bg.t1 AS t1, bg.t2 AS t2 FROM b),
        |pc AS (SELECT t1, t2, count(*) AS c_pair FROM bg GROUP BY 1, 2),
        |cw1 AS (SELECT t1, SUM(c_pair) AS c1, count(*) AS n1p_w1 FROM pc GROUP BY 1),
        |cw2 AS (SELECT t2, count(*) AS n1p_w2 FROM pc GROUP BY 1),
        |npp AS (SELECT count(*) AS n FROM pc),
        |m AS (SELECT t1, t2, CAST(round(ln(
        |        greatest(CAST(c_pair AS DOUBLE) - 0.75, 0.0) / c1
        |          + ((0.75 * CAST(n1p_w1 AS DOUBLE)) / c1)
        |            * (CAST(n1p_w2 AS DOUBLE) / npp.n)
        |      ), 9) AS DECIMAL(28,9)) AS lp
        |      FROM pc JOIN cw1 USING (t1) JOIN cw2 USING (t2) CROSS JOIN npp),
        |s AS (SELECT doc_id, count(*) AS n_bigrams, SUM(lp) AS sm
        |      FROM bg JOIN m USING (t1, t2) GROUP BY 1)
        |SELECT doc_id, n_bigrams, CAST(sm AS DOUBLE) AS sum_logprob,
        |  CAST(sm AS DOUBLE) / n_bigrams AS avg_logprob
        |FROM s ORDER BY doc_id""".stripMargin,

    // Moore-Lewis: per-bigram DECIMAL(12,9) log-prob difference between
    // the in-domain (src1*) and general (everything else) bigram LMs,
    // unseen-in-domain floored at ln(1/(N_in+1)); DECIMAL sums, ties at
    // the top-30 cut broken by doc_id — identical to the TopK
    // aggregator's ordering
    "q119_moore_lewis" ->
      """WITH rb AS (
        |  SELECT doc_id, unnest(list_transform(
        |      generate_series(1, len(tl) - 1),
        |      i -> {'t1': tl[i], 't2': tl[i + 1]})) AS bg
        |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tl
        |        FROM documents WHERE source NOT LIKE 'src1%')),
        |rbg AS (SELECT doc_id, bg.t1 AS t1, bg.t2 AS t2 FROM rb),
        |ib AS (
        |  SELECT doc_id, unnest(list_transform(
        |      generate_series(1, len(tl) - 1),
        |      i -> {'t1': tl[i], 't2': tl[i + 1]})) AS bg
        |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tl
        |        FROM documents WHERE source LIKE 'src1%')),
        |ibg AS (SELECT doc_id, bg.t1 AS t1, bg.t2 AS t2 FROM ib),
        |gpc AS (SELECT t1, t2, count(*) AS c FROM rbg GROUP BY 1, 2),
        |gpfx AS (SELECT t1, SUM(c) AS cp FROM gpc GROUP BY 1),
        |gm AS (SELECT t1, t2, CAST(round(ln(CAST(c AS DOUBLE) / cp), 9)
        |         AS DECIMAL(12,9)) AS glp
        |       FROM gpc JOIN gpfx USING (t1)),
        |ipc AS (SELECT t1, t2, count(*) AS c FROM ibg GROUP BY 1, 2),
        |ipfx AS (SELECT t1, SUM(c) AS cp FROM ipc GROUP BY 1),
        |im AS (SELECT t1, t2, CAST(round(ln(CAST(c AS DOUBLE) / cp), 9)
        |         AS DECIMAL(12,9)) AS ilp
        |       FROM ipc JOIN ipfx USING (t1)),
        |fl AS (SELECT CAST(round(ln(1.0 / (count(*) + 1)), 9)
        |         AS DECIMAL(12,9)) AS lpf FROM ibg),
        |s AS (SELECT doc_id, count(*) AS n_bigrams,
        |        SUM(coalesce(im.ilp, fl.lpf) - gm.glp) AS sm
        |      FROM rbg JOIN gm USING (t1, t2) LEFT JOIN im USING (t1, t2)
        |      CROSS JOIN fl GROUP BY 1),
        |sc AS (SELECT doc_id, n_bigrams,
        |         CAST(sm AS DOUBLE) / n_bigrams AS avg_delta FROM s)
        |SELECT CAST(row_number() OVER (ORDER BY avg_delta DESC, doc_id) AS BIGINT)
        |    AS rnk, doc_id, n_bigrams, avg_delta
        |FROM sc ORDER BY avg_delta DESC, doc_id LIMIT 30""".stripMargin,

    // snapshot diff: the same simulated next crawl, chr(1)-separated
    // md5 content hashes, full join, churn rows only
    "q121_snapshot_diff" ->
      """WITH nxt AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text,
        |    lang, source, n_chars
        |  FROM documents WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, lang, source, n_chars
        |  FROM documents WHERE doc_id % 13 = 0),
        |a AS (SELECT doc_id, md5(concat_ws(chr(1), text, lang, source,
        |        CAST(n_chars AS VARCHAR))) AS ha FROM documents),
        |b AS (SELECT doc_id, md5(concat_ws(chr(1), text, lang, source,
        |        CAST(n_chars AS VARCHAR))) AS hb FROM nxt),
        |sel AS (
        |  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
        |    CASE WHEN hb IS NULL THEN 'removed'
        |         WHEN ha IS NULL THEN 'added'
        |         WHEN ha <> hb THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM a FULL JOIN b ON a.doc_id = b.doc_id)
        |SELECT doc_id, status FROM sel
        |WHERE status <> 'unchanged' ORDER BY doc_id""".stripMargin,

    // distinct-n diversity: per (source, n) distinct vs total n-grams
    "q122_ngram_diversity" ->
      """WITH t AS (
        |  SELECT source, list_filter(string_split(text, ' '), x -> x <> '') AS tl
        |  FROM documents),
        |g AS (
        |  SELECT source, 1 AS n, unnest(tl) AS g FROM t
        |  UNION ALL
        |  SELECT source, 2 AS n, unnest(list_transform(
        |    generate_series(1, len(tl) - 1),
        |    i -> tl[i] || ' ' || tl[i + 1])) AS g FROM t
        |  UNION ALL
        |  SELECT source, 3 AS n, unnest(list_transform(
        |    generate_series(1, len(tl) - 2),
        |    i -> tl[i] || ' ' || tl[i + 1] || ' ' || tl[i + 2])) AS g FROM t),
        |c AS (SELECT source, n, g, count(*) AS c FROM g GROUP BY 1, 2, 3)
        |SELECT source, n, count(*) AS n_distinct,
        |  CAST(SUM(c) AS BIGINT) AS n_total,
        |  CAST(count(*) AS DOUBLE) / CAST(SUM(c) AS BIGINT) AS distinct_ratio
        |FROM c GROUP BY 1, 2 ORDER BY source, n""".stripMargin,

    // skip-gram pairs: positions i, contexts j within ±2, pair counts
    "q136_skipgram" ->
      """WITH t AS (
        |  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS tl
        |  FROM documents),
        |p AS (SELECT tl, unnest(generate_series(1, len(tl))) AS i FROM t),
        |c AS (SELECT tl, i,
        |    unnest(generate_series(greatest(i - 2, 1), least(i + 2, len(tl)))) AS j
        |  FROM p)
        |SELECT tl[i] AS center, tl[j] AS context, count(*) AS cnt
        |FROM c WHERE j <> i
        |GROUP BY 1, 2 ORDER BY center, context""".stripMargin,

    // padding report: truncate to 128, bucket by 16, integer overheads
    "q137_padding_stats" ->
      """WITH n AS (
        |  SELECT least(len(list_filter(string_split(text, ' '), x -> x <> '')), 128) AS n
        |  FROM documents),
        |b AS (SELECT n, CAST(FLOOR((n - 1) / 16.0) AS BIGINT) AS bucket
        |      FROM n WHERE n > 0)
        |SELECT bucket,
        |  least((bucket + 1) * 16, 128) AS bucket_cap,
        |  count(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS n_tokens,
        |  CAST(count(*) * least((bucket + 1) * 16, 128) - SUM(n) AS BIGINT) AS pad_bucketed,
        |  CAST(count(*) * 128 - SUM(n) AS BIGINT) AS pad_global
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    // novelty: distinct shingles per doc, df over docs, df=1 share
    "q138_ngram_novelty" ->
      s"""WITH $shingleCte,
         |dsh AS (SELECT DISTINCT doc_id, sh FROM sh),
         |df AS (SELECT sh, count(*) AS df FROM dsh GROUP BY sh)
         |SELECT doc_id, count(*) AS n_shingles,
         |  CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |  CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS novelty
         |FROM dsh JOIN df USING (sh)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // tg is MATERIALIZED: DuckDB inlines plain CTEs per reference, and
    // five inlined unnest trees sent its join planner into a tailspin
    "q101_trigram_lm" ->
      """WITH tg AS MATERIALIZED (
        |  SELECT doc_id, x.t1, x.t2, x.t3 FROM (
        |    SELECT doc_id, unnest(list_transform(
        |        generate_series(1, len(tl) - 2),
        |        i -> {'t1': tl[i], 't2': tl[i + 1], 't3': tl[i + 2]})) AS x
        |    FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tl
        |          FROM documents)
        |    WHERE len(tl) >= 3)),
        |c123 AS (SELECT t1, t2, t3, count(*) AS c123 FROM tg GROUP BY 1, 2, 3),
        |c12 AS (SELECT t1, t2, SUM(c123) AS c12 FROM c123 GROUP BY 1, 2),
        |c23 AS (SELECT t2, t3, count(*) AS c23 FROM tg GROUP BY 1, 2),
        |c2 AS (SELECT t2, SUM(c23) AS c2 FROM c23 GROUP BY 1),
        |c3 AS (SELECT t3, count(*) AS c3 FROM tg GROUP BY 1),
        |n AS (SELECT count(*) AS nn FROM tg),
        |m AS (
        |  SELECT t1, t2, t3,
        |    CAST(round(ln(
        |      CAST(0.7 AS DOUBLE) * (CAST(c123 AS DOUBLE) / c12)
        |        + CAST(0.2 AS DOUBLE) * (CAST(c23 AS DOUBLE) / c2)
        |        + CAST(0.1 AS DOUBLE) * (CAST(c3 AS DOUBLE) / nn)), 9)
        |      AS DECIMAL(28,9)) AS lp
        |  FROM c123 JOIN c12 USING (t1, t2)
        |  JOIN c23 USING (t2, t3) JOIN c2 USING (t2)
        |  JOIN c3 USING (t3) CROSS JOIN n),
        |s AS (SELECT doc_id, count(*) AS n_trigrams, SUM(lp) AS sm
        |      FROM tg JOIN m USING (t1, t2, t3) GROUP BY 1)
        |SELECT doc_id, n_trigrams, CAST(sm AS DOUBLE) AS sum_logprob,
        |  CAST(sm AS DOUBLE) / n_trigrams AS avg_logprob
        |FROM s ORDER BY doc_id""".stripMargin,

    // 5-NN majority-vote classification over exact cosine neighbors
    "q71_knn_classify" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
        |           FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv, label AS true_label
        |      FROM e WHERE vec_id < 10),
        |s AS (SELECT query_id, e.vec_id AS neighbor_id, e.label AS nl,
        |        list_dot_product(qv, e.v) AS sim
        |      FROM q JOIN e ON query_id <> e.vec_id),
        |nn AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |         ORDER BY sim DESC, neighbor_id) AS rnk FROM s),
        |v AS (SELECT query_id, nl, count(*) AS n_votes
        |      FROM nn WHERE rnk <= 5 GROUP BY 1, 2),
        |p AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY n_votes DESC, nl) AS pr FROM v)
        |SELECT query_id, true_label, nl AS pred_label, n_votes
        |FROM p JOIN q USING (query_id) WHERE pr = 1
        |ORDER BY query_id""".stripMargin,

    "q72_random_projection" -> randomProjectionOracle,

    // BM25 with the engine's exact expression shape: one rounded ln per
    // term, per-term scores decimal-summed — rank-stable across engines
    "q80_bm25" ->
      s"""WITH $tokCte,
         |lens AS (
         |  SELECT doc_id,
         |    CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT)
         |      AS len
         |  FROM documents),
         |st AS (SELECT count(*) AS n, SUM(len) AS tot FROM lens),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
         |       WHERE tok IN ('hash', 'join', 'filter') GROUP BY 1, 2),
         |dfx AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
         |s AS (SELECT doc_id,
         |        CAST(round(
         |          ln(1.0 + (CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5))
         |          * ((tf * 2.2)
         |             / (tf + 1.2 * (0.25 + 0.75 * (len / (CAST(tot AS DOUBLE) / n))))),
         |          9) AS DECIMAL(28,9)) AS s
         |      FROM tf JOIN dfx USING (tok) JOIN lens USING (doc_id), st)
         |SELECT doc_id, CAST(SUM(s) AS DOUBLE) AS score
         |FROM s GROUP BY doc_id
         |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    // q158: the q80 recipe parameterized by a (query_id, term) VALUES
    // table, per-query top-10 via QUALIFY (score DESC, doc ASC)
    "q158_bm25_batch" ->
      s"""WITH $tokCte,
         |q(query_id, term) AS (VALUES
         |  (0, 'hash'), (0, 'join'), (0, 'filter'),
         |  (1, 'stream'), (1, 'window'),
         |  (2, 'sort'), (2, 'merge'), (2, 'dup'),
         |  (3, 'vector'), (3, 'query'), (3, 'fast')),
         |lens AS (
         |  SELECT doc_id,
         |    CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT)
         |      AS len
         |  FROM documents),
         |st AS (SELECT count(*) AS n, SUM(len) AS tot FROM lens),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
         |       WHERE tok IN (SELECT DISTINCT term FROM q) GROUP BY 1, 2),
         |dfx AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
         |s AS (SELECT doc_id, tok,
         |        CAST(round(
         |          ln(1.0 + (CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5))
         |          * ((tf * 2.2)
         |             / (tf + 1.2 * (0.25 + 0.75 * (len / (CAST(tot AS DOUBLE) / n))))),
         |          9) AS DECIMAL(28,9)) AS s
         |      FROM tf JOIN dfx USING (tok) JOIN lens USING (doc_id), st),
         |qs AS (SELECT q.query_id, s.doc_id, CAST(SUM(s.s) AS DOUBLE) AS score
         |       FROM s JOIN q ON q.term = s.tok
         |       GROUP BY 1, 2)
         |SELECT CAST(query_id AS BIGINT) AS query_id,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |                          ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
         |  doc_id, score
         |FROM qs
         |QUALIFY rank <= 10
         |ORDER BY query_id, rank""".stripMargin,

    // posting-list AND: docs whose distinct-token set covers the phrase
    "q79_phrase_search" ->
      s"""WITH $tokCte
         |SELECT doc_id FROM (SELECT DISTINCT doc_id, tok FROM toks)
         |WHERE tok IN ('hash', 'join', 'filter')
         |GROUP BY doc_id HAVING count(*) = 3
         |ORDER BY doc_id""".stripMargin,

    // frequency-ranked vocabulary encoding; QUALIFY keeps the rank
    // window before the cutoff, exactly like the Spark filter
    "q78_encode_tokens" ->
      s"""WITH $tokCte,
         |pt AS (
         |  SELECT doc_id, unnest(list_transform(
         |      generate_series(1, len(tl)),
         |      i -> {'pos': i, 'tok': tl[i]})) AS x
         |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tl
         |        FROM documents)),
         |pos AS (SELECT doc_id, CAST(x.pos AS BIGINT) AS pos, x.tok AS tok FROM pt),
         |v AS (
         |  SELECT tok, CAST(row_number() OVER (ORDER BY count(*) DESC, tok)
         |    AS BIGINT) AS token_id
         |  FROM toks GROUP BY tok
         |  QUALIFY token_id <= 100)
         |SELECT doc_id, pos, coalesce(token_id, 0) AS token_id
         |FROM pos LEFT JOIN v USING (tok)
         |WHERE doc_id < 50
         |ORDER BY doc_id, pos""".stripMargin,

    // mixture sampling: per-source token totals → capped fraction →
    // 1/256-granular md5-nibble threshold, all literal-mirrored
    "q74_mixture_sample" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents),
        |f AS (
        |  SELECT source,
        |    floor(least(1.0,
        |      (CASE source WHEN 'src0' THEN 0.4 WHEN 'src1' THEN 0.2
        |       ELSE 0.02 END) * 5000.0 / SUM(n_tokens)) * 256) AS thr
        |  FROM d GROUP BY source)
        |SELECT doc_id, source, n_tokens
        |FROM d JOIN f USING (source)
        |WHERE (strpos('0123456789abcdef',
        |         substr(md5(source || '|' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
        |    + (strpos('0123456789abcdef',
        |         substr(md5(source || '|' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) < thr
        |ORDER BY doc_id""".stripMargin,

    // per-source cap: the TopK-aggregator result equals the window
    // row_number form by construction (same ord-desc, id-asc order)
    "q89_cap_per_source" ->
      """SELECT source, rnk, doc_id, ord FROM (
        |  SELECT source,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY CAST(n_chars AS DOUBLE) DESC, doc_id) AS BIGINT) AS rnk,
        |    doc_id, CAST(n_chars AS DOUBLE) AS ord
        |  FROM documents)
        |WHERE rnk <= 15
        |ORDER BY source, rnk""".stripMargin,

    // JSONL round-trip: the read-back rows must equal the source table
    "q90_jsonl_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q91_gopher_rules" -> gopherRulesOracle,
    "q189_domain_reputation" -> domainReputationOracle,
    "q192_c4_clean" -> c4CleanOracle,

    // q198: the same seven signals replayed at all three grains; top-n
    // picks replay the (count DESC, gram ASC) tie-break as a window
    "q198_repetition_signals" -> {
      def topCte(n: Int) = {
        val upper = s"len(tl) - ${n - 1}"
        s"""g$n AS (SELECT doc_id, len,
           |  array_to_string(list_slice(tl, i, i + ${n - 1}), ' ') AS g
           |  FROM (SELECT doc_id, len, tl,
           |    unnest(generate_series(1, $upper)) AS i
           |    FROM tl WHERE len(tl) >= $n)),
           |c$n AS (SELECT doc_id, len, g, count(*) AS c FROM g$n GROUP BY 1,2,3),
           |t$n AS (SELECT doc_id,
           |  CAST(c * length(g) AS DOUBLE) / len AS top${n}_frac
           |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
           |    ORDER BY c DESC, g ASC) AS rn FROM c$n) WHERE rn = 1)""".stripMargin
      }
      s"""WITH d AS (SELECT doc_id,
         |    substr(text, 1, 60) || chr(10) || 'Repeated boilerplate line.'
         |    || chr(10) || 'Repeated boilerplate line.'
         |    || chr(10) || chr(10) ||
         |    CASE WHEN doc_id % 3 = 0 THEN 'Syndicated paragraph body.'
         |         ELSE 'Unique middle paragraph ' || CAST(doc_id AS VARCHAR) || '.'
         |    END || chr(10) || chr(10) ||
         |    CASE WHEN doc_id % 3 = 0 THEN 'Syndicated paragraph body.'
         |         ELSE substr(text, 61, 60) END AS text
         |  FROM documents),
         |lu AS (SELECT doc_id, unnest(list_filter(string_split(text, chr(10)),
         |         x -> x <> '')) AS u FROM d),
         |lc AS (SELECT doc_id, u, count(*) AS c FROM lu GROUP BY 1, 2),
         |lf AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
         |    CAST(sum(c - 1) AS DOUBLE) / sum(c) AS frac_dup_lines,
         |    CAST(sum((c - 1) * length(u)) AS DOUBLE) / sum(c * length(u))
         |      AS frac_chars_dup_lines
         |  FROM lc GROUP BY 1),
         |pu AS (SELECT doc_id, unnest(list_filter(
         |         string_split(text, chr(10) || chr(10)), x -> x <> '')) AS u
         |       FROM d),
         |pc AS (SELECT doc_id, u, count(*) AS c FROM pu GROUP BY 1, 2),
         |pf AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_paras,
         |    CAST(sum(c - 1) AS DOUBLE) / sum(c) AS frac_dup_paras,
         |    CAST(sum((c - 1) * length(u)) AS DOUBLE) / sum(c * length(u))
         |      AS frac_chars_dup_paras
         |  FROM pc GROUP BY 1),
         |tl AS (SELECT doc_id, length(text) AS len,
         |    list_filter(regexp_split_to_array(text, '[ \t\n\r]+'),
         |                x -> x <> '') AS tl FROM d),
         |${topCte(2)},
         |${topCte(3)},
         |${topCte(4)}
         |SELECT lf.doc_id, lf.n_lines, lf.frac_dup_lines, lf.frac_chars_dup_lines,
         |  pf.n_paras, pf.frac_dup_paras, pf.frac_chars_dup_paras,
         |  coalesce(t2.top2_frac, 0.0) AS top2_frac,
         |  coalesce(t3.top3_frac, 0.0) AS top3_frac,
         |  coalesce(t4.top4_frac, 0.0) AS top4_frac
         |FROM lf JOIN pf USING (doc_id)
         |LEFT JOIN t2 USING (doc_id) LEFT JOIN t3 USING (doc_id)
         |LEFT JOIN t4 USING (doc_id)
         |ORDER BY lf.doc_id""".stripMargin
    },

    // q197: the same section-binding parse (last_value IGNORE NULLS
    // over line position), same wildcard-only prefix semantics
    "q197_robots_gate" ->
      """WITH r AS (SELECT DISTINCT CAST(doc_id % 7 AS VARCHAR) AS d FROM documents),
        |rob AS (SELECT 'site' || d || '.example.com' AS domain,
        |  CASE WHEN d = '3' THEN 'User-agent: *' || chr(10) || 'Disallow:'
        |       WHEN d = '5' THEN 'User-agent: gptbot' || chr(10) || 'Disallow: /'
        |       ELSE 'User-agent: gptbot' || chr(10) || 'Disallow: /' || chr(10) ||
        |            'User-agent: *' || chr(10) || 'Disallow: /private/' || chr(10) ||
        |            'Disallow: /tmp' || chr(10) ||
        |            'User-agent: otherbot' || chr(10) || 'Disallow: /public/'
        |  END AS robots FROM r),
        |lines AS (SELECT domain, i AS pos, trim(parts[i]) AS lt FROM
        |  (SELECT domain, parts, unnest(generate_series(1, len(parts))) AS i
        |   FROM (SELECT domain, string_split(robots, chr(10)) AS parts FROM rob))),
        |p AS (SELECT domain, pos,
        |   CASE WHEN lower(lt) LIKE 'user-agent:%' THEN trim(substr(lt, 12)) END AS ua,
        |   CASE WHEN lower(lt) LIKE 'disallow:%' THEN trim(substr(lt, 10)) END AS dis
        |   FROM lines),
        |g AS (SELECT domain, pos, dis,
        |   last_value(ua IGNORE NULLS) OVER (PARTITION BY domain ORDER BY pos
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gov
        |   FROM p),
        |rules AS (SELECT domain, dis AS prefix FROM g
        |   WHERE gov = '*' AND dis IS NOT NULL AND dis <> ''),
        |u AS (SELECT doc_id,
        |   'https://site' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' ||
        |   CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN '/private/x'
        |        WHEN 1 THEN '/public/y' WHEN 2 THEN '/tmp-file'
        |        ELSE '/ok/z' END AS url
        |   FROM documents),
        |uu AS (SELECT doc_id, url,
        |   lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)', 1)) AS domain,
        |   regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$', 1) AS path
        |   FROM u)
        |SELECT uu.doc_id, uu.url, uu.domain,
        |   coalesce(max(CASE WHEN rules.prefix IS NOT NULL
        |     AND starts_with(uu.path, rules.prefix) THEN 1 ELSE 0 END), 0) = 0
        |     AS allowed
        |FROM uu LEFT JOIN rules USING (domain)
        |GROUP BY uu.doc_id, uu.url, uu.domain
        |ORDER BY doc_id""".stripMargin,

    // q200: the expected edge set derived ARITHMETICALLY per doc —
    // an independent check on the engine's RFC 3986 merge + dot
    // removal, not a replay of its regex chain
    "q200_resolve_links" ->
      """WITH b AS (SELECT doc_id,
        |    CAST(doc_id % 7 AS VARCHAR) AS d7, CAST(doc_id % 5 AS VARCHAR) AS m5
        |  FROM documents),
        |s AS (SELECT doc_id,
        |    'site' || d7 || '.example.com' AS sd,
        |    'https://site' || d7 || '.example.com' AS base, m5 FROM b)
        |SELECT doc_id, src_domain, dst_url, dst_domain FROM (
        |  SELECT doc_id, sd AS src_domain,
        |    'https://ext' || m5 || '.com/page?x=1' AS dst_url,
        |    'ext' || m5 || '.com' AS dst_domain FROM s
        |  UNION ALL SELECT doc_id, sd, base || '/a/b/page2.html', sd FROM s
        |  UNION ALL SELECT doc_id, sd, base || '/a/up.html', sd FROM s
        |  UNION ALL SELECT doc_id, sd, base || '/a/b/same/x', sd FROM s
        |  UNION ALL SELECT doc_id, sd, base || '/root.html', sd FROM s
        |  UNION ALL SELECT doc_id, sd, base || '/a/b/img/pic.png?s=1', sd FROM s
        |  UNION ALL SELECT doc_id, sd, base || '/a/b/page.html?page=2', sd FROM s
        |  UNION ALL SELECT doc_id, sd, 'https://cdn.shared.net/asset.js',
        |    'cdn.shared.net' FROM s)
        |ORDER BY doc_id, dst_url""".stripMargin,

    // q205: the post-canonical keys are known arithmetically (and
    // are already in normal form), so the oracle plants them and
    // replays only the keep-newest pick
    "q205_canonical_dedup" ->
      """WITH u AS (SELECT doc_id,
        |    'https://canon' || CAST(doc_id % 50 AS VARCHAR) ||
        |    '.example.com/page' ||
        |    CASE WHEN doc_id % 3 = 0
        |         THEN '?v=' || CAST(doc_id AS VARCHAR) ELSE '' END AS url,
        |    doc_id % 100 AS ts,
        |    CASE WHEN doc_id % 5 = 0 THEN 'Stable canonical body.'
        |         ELSE text END AS text
        |  FROM documents),
        |w AS (SELECT url, doc_id, ts, text,
        |    row_number() OVER (PARTITION BY url
        |      ORDER BY ts DESC, strlen(text) DESC, doc_id ASC) AS rn
        |  FROM u),
        |g AS (SELECT url, count(*) AS n_snapshots,
        |    count(DISTINCT md5(text)) AS n_distinct_texts
        |  FROM u GROUP BY 1)
        |SELECT w.url, w.doc_id, w.ts, w.text, g.n_snapshots, g.n_distinct_texts
        |FROM w JOIN g USING (url) WHERE rn = 1 ORDER BY url""".stripMargin,

    // q204: the same split + distinct-doc frequency + ordered
    // string_agg reassembly (string_agg skips the dropped-paragraph
    // NULLs exactly like collect_list)
    "q204_paragraph_dedup" ->
      """WITH d AS (SELECT doc_id,
        |    substr(text, 1, 50) || chr(10) || chr(10) ||
        |    'Subscribe to our newsletter.' || chr(10) || chr(10) ||
        |    'Shared group banner ' || CAST(doc_id % 5 AS VARCHAR) || '.' ||
        |    chr(10) || chr(10) ||
        |    'Unique tail ' || CAST(doc_id AS VARCHAR) || '.' AS text
        |  FROM documents),
        |p AS (SELECT doc_id, i AS pos, parts[i] AS para FROM
        |  (SELECT doc_id, parts, unnest(generate_series(1, len(parts))) AS i
        |   FROM (SELECT doc_id, list_filter(
        |     string_split(text, chr(10) || chr(10)), x -> x <> '') AS parts
        |     FROM d))),
        |f AS (SELECT md5(para) AS h, count(DISTINCT doc_id) AS df
        |  FROM p GROUP BY 1),
        |j AS (SELECT p.doc_id, p.pos, p.para, f.df
        |  FROM p JOIN f ON md5(p.para) = f.h)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_paras,
        |  CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |  coalesce(string_agg(CASE WHEN df < 2 THEN para END,
        |    chr(10) || chr(10) ORDER BY pos), '') AS cleaned
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // q202: every head field derived arithmetically — an independent
    // check on the extraction + canonical resolution, not a replay
    "q202_page_meta" ->
      """SELECT doc_id,
        |  'https://site' || CAST(doc_id % 7 AS VARCHAR) ||
        |    '.example.com/a/b/page.html' AS url,
        |  'Doc ' || CAST(doc_id AS VARCHAR) || ' & friends' AS title,
        |  CASE WHEN doc_id % 4 = 3 THEN NULL
        |       ELSE 'Desc ' || CAST(doc_id AS VARCHAR) || ' here' END AS description,
        |  CASE WHEN doc_id % 5 = 4 THEN NULL
        |       WHEN doc_id % 5 = 2 THEN 'https://site' ||
        |         CAST(doc_id % 7 AS VARCHAR) || '.example.com/c/' ||
        |         CAST(doc_id AS VARCHAR)
        |       ELSE 'https://site' || CAST(doc_id % 7 AS VARCHAR) ||
        |         '.example.com/a/canon/' || CAST(doc_id % 10 AS VARCHAR)
        |  END AS canonical_url,
        |  CASE WHEN doc_id % 4 IN (0, 1) THEN 'utf-8' ELSE NULL END AS charset
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q203: each frontier row derived arithmetically per domain
    "q203_sitemap_parse" ->
      """WITH r AS (SELECT DISTINCT CAST(doc_id % 7 AS VARCHAR) AS d FROM documents),
        |s AS (SELECT 'site' || d || '.example.com' AS domain, d FROM r)
        |SELECT domain, pos, 'url' AS kind, loc, lastmod, changefreq,
        |  priority FROM (
        |  SELECT domain, CAST(0 AS BIGINT) AS pos,
        |    'https://site' || d || '.example.com/p1' AS loc,
        |    '2026-01-0' || d AS lastmod, 'daily' AS changefreq,
        |    CAST(0.8 AS DOUBLE) AS priority FROM s
        |  UNION ALL SELECT domain, CAST(1 AS BIGINT),
        |    'https://site' || d || '.example.com/p2', NULL, NULL,
        |    CAST(0.5 AS DOUBLE) FROM s
        |  UNION ALL SELECT domain, CAST(2 AS BIGINT),
        |    'https://site' || d || '.example.com/p3', '2026-02-1' || d, NULL,
        |    CAST(NULL AS DOUBLE) FROM s)
        |ORDER BY domain, pos""".stripMargin,

    // q257: index rows carry lastmod but never changefreq/priority;
    // the url branch replays q203's shape with kind='url'
    "q257_sitemap_index" ->
      """WITH r AS (SELECT DISTINCT CAST(doc_id % 7 AS INT) AS d FROM documents),
        |s AS (SELECT 'site' || CAST(d AS VARCHAR) || '.example.com' AS domain,
        |  CAST(d AS VARCHAR) AS ds, d FROM r)
        |SELECT domain, pos, kind, loc, lastmod, changefreq, priority FROM (
        |  SELECT domain, CAST(0 AS BIGINT) AS pos, 'sitemap' AS kind,
        |    'https://site' || ds || '.example.com/sitemap-a.xml' AS loc,
        |    '2026-03-0' || ds AS lastmod, CAST(NULL AS VARCHAR) AS changefreq,
        |    CAST(NULL AS DOUBLE) AS priority FROM s WHERE d % 2 = 0
        |  UNION ALL SELECT domain, CAST(1 AS BIGINT), 'sitemap',
        |    'https://cdn.maps.net/big' || ds || '.xml', NULL, NULL, NULL
        |    FROM s WHERE d % 2 = 0
        |  UNION ALL SELECT domain, CAST(0 AS BIGINT), 'url',
        |    'https://site' || ds || '.example.com/only', NULL, NULL, NULL
        |    FROM s WHERE d % 2 = 1)
        |ORDER BY domain, pos""".stripMargin,

    // q201: the same section binding as q197, plus Allow capture and
    // the longest-match integer encoding (strlen-bytes*2 + is_allow)
    // — max() IS the RFC 9309 resolution
    "q201_robots_allow" ->
      """WITH r AS (SELECT DISTINCT CAST(doc_id % 7 AS VARCHAR) AS d FROM documents),
        |rob AS (SELECT 'site' || d || '.example.com' AS domain,
        |  CASE WHEN d = '3' THEN 'User-agent: *' || chr(10) || 'Allow: /'
        |         || chr(10) || 'Disallow: /tmp'
        |       WHEN d = '5' THEN 'User-agent: *' || chr(10) || 'Disallow: /dir/'
        |         || chr(10) || 'Allow: /dir/' || chr(10) || 'Disallow: /x'
        |       ELSE 'User-agent: *' || chr(10) || 'Disallow: /' || chr(10) ||
        |            'Allow: /public/' || chr(10) || 'Allow: /pub'
        |  END AS robots FROM r),
        |lines AS (SELECT domain, i AS pos, trim(parts[i]) AS lt FROM
        |  (SELECT domain, parts, unnest(generate_series(1, len(parts))) AS i
        |   FROM (SELECT domain, string_split(robots, chr(10)) AS parts FROM rob))),
        |p AS (SELECT domain, pos,
        |   CASE WHEN lower(lt) LIKE 'user-agent:%' THEN trim(substr(lt, 12)) END AS ua,
        |   CASE WHEN lower(lt) LIKE 'disallow:%' THEN trim(substr(lt, 10)) END AS dis,
        |   CASE WHEN lower(lt) LIKE 'allow:%' THEN trim(substr(lt, 7)) END AS alw
        |   FROM lines),
        |sec AS (SELECT domain, pos, dis, alw,
        |   last_value(ua IGNORE NULLS) OVER (PARTITION BY domain ORDER BY pos) AS gov
        |   FROM p),
        |rules AS (SELECT domain, coalesce(dis, alw) AS prefix,
        |   CASE WHEN alw IS NOT NULL THEN 1 ELSE 0 END AS ia
        |   FROM sec WHERE gov = '*' AND coalesce(dis, alw) IS NOT NULL
        |     AND coalesce(dis, alw) <> ''),
        |u AS (SELECT doc_id,
        |   'site' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' AS domain,
        |   CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN '/public/page'
        |     WHEN 1 THEN '/private/page' WHEN 2 THEN '/pub-file'
        |     WHEN 3 THEN '/tmp-file' ELSE '/dir/x' END AS path
        |   FROM documents),
        |j AS (SELECT u.doc_id,
        |   'https://' || u.domain || u.path AS url, u.domain,
        |   max(CASE WHEN starts_with(u.path, rules.prefix)
        |       THEN strlen(rules.prefix) * 2 + rules.ia END) AS win
        |   FROM u LEFT JOIN rules ON u.domain = rules.domain
        |   GROUP BY 1, 2, 3)
        |SELECT doc_id, url, domain, win IS NULL OR win % 2 = 1 AS allowed
        |FROM j ORDER BY doc_id""".stripMargin,

    // q196: same href regex, same resolution CASE (absolute /
    // protocol-relative / root-relative, in that order), same drops
    "q196_extract_links" ->
      """WITH d AS (SELECT doc_id,
        |    'https://site' || CAST(doc_id % 7 AS VARCHAR) ||
        |      '.example.com/dir/page' AS url,
        |    '<p>' || substr(text, 1, 40) || '</p>' ||
        |    '<a href="https://ext' || CAST(doc_id % 5 AS VARCHAR) ||
        |      '.com/page?x=1">a</a>' ||
        |    '<A HREF="/local/' || CAST(doc_id AS VARCHAR) || '">b</A>' ||
        |    '<a href="//cdn.shared.net/asset.js">c</a>' ||
        |    '<a href="#frag">d</a><a href="relative.html">e</a>' ||
        |    '<a href="mailto:x@y.z">f</a>' AS html
        |  FROM documents),
        |e AS (SELECT doc_id, url,
        |    unnest(regexp_extract_all(html, '[hH][rR][eE][fF]="([^"]*)"', 1)) AS l
        |  FROM d),
        |r AS (SELECT doc_id,
        |    lower(regexp_extract(url,
        |      '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)) AS src_domain,
        |    CASE WHEN regexp_matches(l, '(?i)^(https?|ftp)://') THEN l
        |         WHEN l LIKE '//%' THEN regexp_extract(url,
        |           '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1) || ':' || l
        |         WHEN l LIKE '/%' THEN regexp_extract(url,
        |             '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1) || '://' ||
        |           regexp_extract(url,
        |             '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1) || l
        |         ELSE NULL END AS dst_url
        |  FROM e)
        |SELECT doc_id, src_domain, dst_url,
        |  lower(regexp_extract(dst_url,
        |    '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)', 1)) AS dst_domain
        |FROM r WHERE dst_url IS NOT NULL
        |ORDER BY doc_id, dst_url""".stripMargin,

    // q195: the builder formulas the three parsers must invert
    "q195_gif_webp_tiff" ->
      """SELECT doc_id AS media_id,
        |  CASE CAST(doc_id % 7 AS INT)
        |    WHEN 0 THEN 'gif89a' WHEN 1 THEN 'gif87a'
        |    WHEN 2 THEN 'vp8x' WHEN 3 THEN 'vp8' WHEN 4 THEN 'vp8l'
        |    WHEN 5 THEN 'tiff_ii' ELSE 'tiff_mm' END AS format,
        |  CAST(n_chars % 640 + 1 AS INT) AS width,
        |  CAST(n_chars % 480 + 1 AS INT) AS height
        |FROM documents ORDER BY media_id""".stripMargin,

    // q224: block census arithmetic; the kept paragraph replays the
    // same strip+collapse chain over the planted slice
    "q224_main_content" ->
      """SELECT doc_id, CAST(4 AS BIGINT) AS n_blocks,
        |  CAST(1 AS BIGINT) AS n_kept,
        |  trim(regexp_replace(regexp_replace(substr(text, 1, 60),
        |    '<[^>]*>', ' ', 'g'), '[ \t\n\r]+', ' ', 'g')) AS content
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q225: language id derived per doc_id%6 branch; CASE with no
    // ELSE yields the NULL ext of the shebang/filename/dotfile rows
    "q225_code_langid" ->
      """SELECT doc_id,
        |  CASE doc_id%6 WHEN 0 THEN 'src/app.py' WHEN 1 THEN 'lib/util.scala'
        |    WHEN 2 THEN 'tools/run' WHEN 3 THEN 'Makefile'
        |    WHEN 4 THEN '.gitignore' ELSE 'notes.txt' END AS path,
        |  CASE doc_id%6 WHEN 0 THEN 'py' WHEN 1 THEN 'scala'
        |    WHEN 5 THEN 'txt' END AS ext,
        |  CASE doc_id%6 WHEN 0 THEN 'python' WHEN 1 THEN 'scala'
        |    WHEN 2 THEN 'python' WHEN 3 THEN 'makefile'
        |    WHEN 4 THEN 'unknown' ELSE 'shell' END AS lang,
        |  CASE doc_id%6 WHEN 0 THEN 'ext' WHEN 1 THEN 'ext'
        |    WHEN 2 THEN 'shebang' WHEN 3 THEN 'filename'
        |    WHEN 4 THEN 'unknown' ELSE 'shebang' END AS lang_source
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q226: license per doc_id%5 branch; SPDX beats the GPL phrase
    // on branch 3, branch 4 detects nothing
    "q226_license_scan" ->
      """SELECT doc_id,
        |  CASE doc_id%5 WHEN 0 THEN 'Apache-2.0' WHEN 3 THEN 'MIT' END AS spdx,
        |  CASE doc_id%5 WHEN 0 THEN 'Apache-2.0' WHEN 1 THEN 'MIT'
        |    WHEN 2 THEN 'GPL-3.0' WHEN 3 THEN 'MIT' END AS license,
        |  CASE WHEN doc_id%5 = 4 THEN 'none'
        |    WHEN doc_id%5 = 2 THEN 'copyleft' ELSE 'permissive' END AS category
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q227: every stat is exact integer arithmetic on the planted
    // three-line fixture (line1 by lang, 'val x = 1;', 80+2k 'ab's)
    "q227_code_stats" ->
      """WITH b AS (SELECT doc_id, doc_id%4 AS m, doc_id%30 AS k FROM documents)
        |SELECT doc_id, CAST(3 AS BIGINT) AS n_lines,
        |  CAST(CASE m WHEN 0 THEN 13 WHEN 3 THEN 12 ELSE 9 END
        |    + 12 + 80 + 2*k AS BIGINT) AS n_chars,
        |  CAST(CASE m WHEN 0 THEN 9 WHEN 3 THEN 11 ELSE 6 END
        |    + 5 + 80 + 2*k AS BIGINT) AS n_alnum,
        |  CAST(80 + 2*k AS BIGINT) AS max_line_len,
        |  CAST(CASE WHEN k > 20 THEN 1 ELSE 0 END AS BIGINT) AS n_long_lines,
        |  CAST(CASE WHEN m = 3 THEN 0 ELSE 1 END AS BIGINT) AS n_comment_lines,
        |  m = 0 AS is_autogen
        |FROM b ORDER BY doc_id""".stripMargin,

    // q228: two cells per parseable notebook; the %11 docs are
    // malformed and contribute zero rows
    "q228_notebook_cells" ->
      """SELECT doc_id, CAST(0 AS BIGINT) AS cell_idx, 'markdown' AS cell_type,
        |  '# T' || CAST(doc_id AS VARCHAR) AS source,
        |  CAST(1 AS BIGINT) AS n_lines
        |FROM documents WHERE doc_id%11 <> 0
        |UNION ALL
        |SELECT doc_id, CAST(1 AS BIGINT), 'code',
        |  'x=1' || chr(10) || 'y=' || CAST(doc_id%9 AS VARCHAR) || chr(10),
        |  CAST(2 AS BIGINT)
        |FROM documents WHERE doc_id%11 <> 0
        |ORDER BY doc_id, cell_idx""".stripMargin,

    // q229: flags and char totals per conversation shape; L is the
    // decimal width of doc_id
    "q229_chat_validate" ->
      """WITH b AS (SELECT doc_id, doc_id%4 AS m,
        |    length(CAST(doc_id AS VARCHAR)) AS L FROM documents)
        |SELECT doc_id,
        |  CAST(CASE m WHEN 0 THEN 4 WHEN 3 THEN 2 ELSE 3 END AS BIGINT)
        |    AS n_turns,
        |  m = 0 AS has_system,
        |  TRUE AS roles_ok,
        |  TRUE AS starts_user,
        |  m <> 1 AS ends_assistant,
        |  m <> 2 AS alternates,
        |  m <> 3 AS no_blank,
        |  CAST(CASE m WHEN 0 THEN 2+L WHEN 1 THEN 2+L WHEN 2 THEN 2
        |    ELSE 1 END AS BIGINT) AS n_user_chars,
        |  CAST(CASE m WHEN 0 THEN 4 WHEN 1 THEN 2 WHEN 2 THEN 1+L
        |    ELSE 1 END AS BIGINT) AS n_assistant_chars,
        |  m = 0 AS valid
        |FROM b ORDER BY doc_id""".stripMargin,

    // q230: the rendered template assembled arithmetically
    "q230_chat_render" ->
      """SELECT doc_id, CAST(2 AS BIGINT) AS n_msgs,
        |  '<|user|>' || chr(10) || 'Q' || CAST(doc_id AS VARCHAR) ||
        |  '<|end|>' || chr(10) || '<|assistant|>' || chr(10) ||
        |  'A' || CAST(doc_id%5 AS VARCHAR) || '<|end|>' || chr(10) AS rendered
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q231: exact floor pivots and PSM assembly replayed over the
    // same slice (// is DuckDB integer division)
    "q231_fim_split" ->
      """WITH s AS (SELECT doc_id,
        |    substr(text, 1, CAST(40 + doc_id%20 AS INT)) AS t FROM documents),
        |d AS (SELECT doc_id, t, length(t) AS n,
        |    length(t)*33//100 AS lo, length(t)*66//100 AS hi FROM s)
        |SELECT doc_id, CAST(lo AS BIGINT) AS n_prefix,
        |  CAST(hi - lo AS BIGINT) AS n_middle,
        |  CAST(n - hi AS BIGINT) AS n_suffix,
        |  '<fim_prefix>' || substr(t, 1, lo) || '<fim_suffix>' ||
        |    substr(t, hi + 1) || '<fim_middle>' ||
        |    substr(t, lo + 1, hi - lo) AS fim
        |FROM d ORDER BY doc_id""".stripMargin,

    // q232: the monotone cumulative-sum prefix replays the
    // first-overflow-stops rule (block lengths are positive)
    "q232_repo_pack" ->
      """WITH f AS (SELECT 'repo' || CAST(doc_id%7 AS VARCHAR) AS repo,
        |    'src/' || CAST(doc_id AS VARCHAR) || '.py' AS path,
        |    repeat('x', CAST(5 + doc_id%4 AS INT)) AS txt FROM documents),
        |b AS (SELECT repo, path,
        |    '<file> ' || path || chr(10) || txt || chr(10) AS block FROM f),
        |c AS (SELECT repo, path, block, sum(length(block))
        |    OVER (PARTITION BY repo ORDER BY path
        |          ROWS UNBOUNDED PRECEDING) AS cum FROM b),
        |k AS (SELECT repo, count(*) AS n_packed, max(cum) AS n_chars,
        |    string_agg(block, '' ORDER BY path) AS packed
        |  FROM c WHERE cum <= 400 GROUP BY repo),
        |t AS (SELECT repo, count(*) AS n_files FROM b GROUP BY repo)
        |SELECT t.repo, CAST(t.n_files AS BIGINT) AS n_files,
        |  CAST(coalesce(k.n_packed, 0) AS BIGINT) AS n_packed,
        |  CAST(coalesce(k.n_chars, 0) AS BIGINT) AS n_chars,
        |  coalesce(k.packed, '') AS packed
        |FROM t LEFT JOIN k USING(repo) ORDER BY repo""".stripMargin,

    // q233: counts sized by doc_id arithmetic; the second file block
    // appears on even docs only
    "q233_diff_stats" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN doc_id%2 = 0 THEN 2 ELSE 1 END AS BIGINT) AS n_files,
        |  CAST(CASE WHEN doc_id%2 = 0 THEN 2 ELSE 1 END AS BIGINT) AS n_hunks,
        |  CAST(doc_id%4 + 1 + CASE WHEN doc_id%2 = 0 THEN 1 ELSE 0 END
        |    AS BIGINT) AS n_added,
        |  CAST(doc_id%3 + CASE WHEN doc_id%2 = 0 THEN 1 ELSE 0 END
        |    AS BIGINT) AS n_deleted
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q234: pure doc_id arithmetic (k+1 objects, k pages)
    "q234_pdf_meta" ->
      """SELECT doc_id AS media_id,
        |  '1.' || CAST(doc_id%4 + 4 AS VARCHAR) AS version,
        |  CAST(doc_id%5 + 2 AS BIGINT) AS n_objs,
        |  CAST(doc_id%5 + 1 AS BIGINT) AS n_pages,
        |  doc_id%7 = 0 AS encrypted,
        |  doc_id%2 = 0 AS has_eof
        |FROM documents ORDER BY media_id""".stripMargin,

    // q235: entry census per shape; epub carries two members
    "q235_zip_meta" ->
      """SELECT doc_id AS media_id,
        |  CAST(CASE WHEN doc_id%4 = 2 THEN 2 ELSE 1 END AS BIGINT)
        |    AS n_entries,
        |  TRUE AS complete,
        |  CASE doc_id%4 WHEN 0 THEN 'word/document.xml'
        |    WHEN 1 THEN 'xl/workbook.xml' WHEN 2 THEN 'mimetype'
        |    ELSE 'a.txt' END AS first_name,
        |  CAST((doc_id%3 + 1) * (CASE WHEN doc_id%4 = 2 THEN 2 ELSE 1 END)
        |    AS BIGINT) AS total_usize,
        |  CASE doc_id%4 WHEN 0 THEN 'docx' WHEN 1 THEN 'xlsx'
        |    WHEN 2 THEN 'epub' ELSE 'zip' END AS kind
        |FROM documents ORDER BY media_id""".stripMargin,

    // q236: header fields replayed arithmetically
    "q236_gzip_meta" ->
      """SELECT doc_id AS media_id, CAST(8 AS INT) AS method,
        |  CAST(doc_id AS BIGINT) AS mtime,
        |  CAST(doc_id%13 AS INT) AS os,
        |  doc_id%3 = 0 AS is_text,
        |  CASE WHEN doc_id%2 = 0
        |    THEN 'f' || CAST(doc_id%9 AS VARCHAR) || '.txt' END AS fname
        |FROM documents ORDER BY media_id""".stripMargin,

    // q237: fixture-constant lengths per shape
    "q237_pref_validate" ->
      """WITH b AS (SELECT doc_id, doc_id%4 AS m FROM documents)
        |SELECT doc_id AS pair_id,
        |  m <> 2 AS non_blank,
        |  m <> 1 AS distinct_pair,
        |  CAST(CASE m WHEN 0 THEN 30 WHEN 1 THEN 25 WHEN 2 THEN 10
        |    ELSE 15 END AS BIGINT) AS n_chosen_chars,
        |  CAST(CASE m WHEN 0 THEN 20 WHEN 1 THEN 25 WHEN 2 THEN 2
        |    ELSE 40 END AS BIGINT) AS n_rejected_chars,
        |  m IN (0, 2) AS chosen_longer,
        |  m IN (0, 3) AS valid
        |FROM b ORDER BY pair_id""".stripMargin,

    // q238: the same per-model census derived by SQL aggregation
    "q238_win_rate" ->
      """WITH c AS (SELECT 'm' || CAST(doc_id%3 AS VARCHAR) AS model_a,
        |    'm' || CAST((doc_id%3 + 1)%3 AS VARCHAR) AS model_b,
        |    CASE WHEN doc_id%5 < 2 THEN 'a' WHEN doc_id%5 < 4 THEN 'b'
        |      ELSE 'tie' END AS winner FROM documents),
        |s AS (
        |  SELECT model_a AS model,
        |    CASE winner WHEN 'a' THEN 'win' WHEN 'b' THEN 'loss'
        |      ELSE 'tie' END AS outcome FROM c
        |  UNION ALL
        |  SELECT model_b,
        |    CASE winner WHEN 'b' THEN 'win' WHEN 'a' THEN 'loss'
        |      ELSE 'tie' END FROM c)
        |SELECT model,
        |  CAST(count(*) FILTER (outcome = 'win') AS BIGINT) AS n_wins,
        |  CAST(count(*) FILTER (outcome = 'loss') AS BIGINT) AS n_losses,
        |  CAST(count(*) FILTER (outcome = 'tie') AS BIGINT) AS n_ties,
        |  CAST(count(*) AS BIGINT) AS n_comps,
        |  CAST(count(*) FILTER (outcome = 'win') AS DOUBLE) /
        |    CAST(count(*) FILTER (outcome IN ('win','loss')) AS DOUBLE)
        |    AS win_frac
        |FROM s GROUP BY model ORDER BY model""".stripMargin,

    // q239: the same exact integer moments derived in SQL; kappa is
    // the identical double expression over them
    "q239_fleiss_kappa" ->
      """WITH r AS (SELECT doc_id AS item_id, j,
        |    CASE WHEN j < 2 THEN doc_id%3
        |      WHEN doc_id%2 = 0 THEN doc_id%3
        |      ELSE (doc_id + 1)%3 END AS lab
        |  FROM documents, (SELECT unnest(generate_series(0, 2)) AS j)),
        |cell AS (SELECT item_id, lab, count(*) AS nij
        |  FROM r GROUP BY 1, 2),
        |pi AS (SELECT item_id, sum(nij) AS n, sum(nij*nij) AS sq
        |  FROM cell GROUP BY 1),
        |m AS (SELECT lab, sum(nij) AS mj FROM cell GROUP BY 1),
        |agg AS (SELECT count(*) AS n_items, sum(sq) AS sumsq FROM pi),
        |pe AS (SELECT sum(CAST(mj AS HUGEINT) * mj) AS pe_num FROM m)
        |SELECT CAST(n_items AS BIGINT) AS n_items,
        |  CAST(3 AS BIGINT) AS n_raters,
        |  CAST(0 AS BIGINT) AS n_excluded,
        |  CAST(sumsq - n_items*3 AS BIGINT) AS po_num,
        |  CAST(n_items*3*2 AS BIGINT) AS po_den,
        |  CAST(pe_num AS VARCHAR) AS pe_num,
        |  CAST(CAST(n_items*3 AS HUGEINT) * (n_items*3) AS VARCHAR)
        |    AS pe_den,
        |  (CAST(sumsq - n_items*3 AS DOUBLE) / CAST(n_items*3*2 AS DOUBLE)
        |    - CAST(pe_num AS DOUBLE) /
        |      CAST(CAST(n_items*3 AS HUGEINT) * (n_items*3) AS DOUBLE)) /
        |  (1.0 - CAST(pe_num AS DOUBLE) /
        |      CAST(CAST(n_items*3 AS HUGEINT) * (n_items*3) AS DOUBLE))
        |    AS kappa
        |FROM agg, pe""".stripMargin,

    // q240: both markdown strings assembled arithmetically
    "q240_table_markdown" ->
      """SELECT doc_id, CAST(0 AS BIGINT) AS table_idx,
        |  CAST(2 AS BIGINT) AS n_rows, CAST(2 AS BIGINT) AS n_cols,
        |  '| Name | Value |' || chr(10) || '| --- | --- |' || chr(10) ||
        |    '| alpha & co | ' || CAST(doc_id AS VARCHAR) || ' |' AS markdown
        |FROM documents
        |UNION ALL
        |SELECT doc_id, CAST(1 AS BIGINT), CAST(1 AS BIGINT),
        |  CAST(1 AS BIGINT),
        |  '| solo ' || CAST(doc_id%9 AS VARCHAR) || ' |'
        |FROM documents WHERE doc_id%4 = 0
        |ORDER BY doc_id, table_idx""".stripMargin,

    // q241: ceil arithmetic replayed with generate_series
    "q241_chunk_text" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |c AS (SELECT doc_id, text,
        |    unnest(generate_series(0, CASE WHEN n <= 50 THEN 0
        |      ELSE CAST(ceil((n - 50)/40.0) AS BIGINT) END)) AS i
        |  FROM d WHERE n > 0)
        |SELECT doc_id, i AS chunk_idx, i*40 + 1 AS chunk_start,
        |  CAST(length(substr(text, CAST(i*40 + 1 AS INT), 50)) AS BIGINT)
        |    AS n_chunk_chars,
        |  substr(text, CAST(i*40 + 1 AS INT), 50) AS chunk
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    // q242: fixture-constant scores (multiset overlap pinned by the
    // x-x-y branch)
    "q242_eval_scores" ->
      """SELECT doc_id AS pred_id,
        |  doc_id%4 = 1 AS em,
        |  CASE doc_id%4 WHEN 0 THEN 0.8 WHEN 1 THEN 1.0 WHEN 2 THEN 0.0
        |    ELSE 0.8 END AS best_f1,
        |  CAST(CASE doc_id%4 WHEN 0 THEN 3 WHEN 1 THEN 1 WHEN 2 THEN 2
        |    ELSE 3 END AS BIGINT) AS n_pred_tokens
        |FROM documents ORDER BY pred_id""".stripMargin,

    // q243: directives per branch; content keeps original case
    "q243_robots_meta" ->
      """SELECT doc_id,
        |  CASE doc_id%4 WHEN 0 THEN 'noindex, nofollow'
        |    WHEN 1 THEN 'NOARCHIVE' WHEN 3 THEN 'all' END AS robots_content,
        |  doc_id%4 = 0 AS noindex,
        |  doc_id%4 = 0 AS nofollow,
        |  doc_id%4 = 1 AS noarchive
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q244: codes and range replayed arithmetically (floor is
    // tie-free)
    "q244_sq8_quantize" ->
      """SELECT doc_id AS emb_id,
        |  array_to_string(list_transform(generate_series(0, 7),
        |    i -> CAST(CAST(floor(i*3*255.0/21) AS INT) AS VARCHAR)), ',')
        |    AS codes_str,
        |  CAST(doc_id%5 AS DOUBLE) AS q_min,
        |  CAST(doc_id%5 + 21 AS DOUBLE) AS q_max,
        |  21.0/255.0 AS max_abs_err
        |FROM documents ORDER BY emb_id""".stripMargin,

    // q245: buckets, cosines and margins replayed with the inlined
    // plane family; only the decisions are hashed
    "q245_bitext_mine" -> bitextMineOracle,

    // q246: the dispatcher label per planted magic
    "q246_sniff_format" ->
      """SELECT doc_id AS media_id,
        |  CASE doc_id%10 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |    WHEN 2 THEN 'gif' WHEN 3 THEN 'wav' WHEN 4 THEN 'heif'
        |    WHEN 5 THEN 'mp4' WHEN 6 THEN 'pdf' WHEN 7 THEN 'gzip'
        |    WHEN 8 THEN 'parquet' ELSE 'unknown' END AS format
        |FROM documents ORDER BY media_id""".stripMargin,

    // q247: dims from the n_chars arithmetic; the viewBox branch
    // carries no width/height, the html branch no struct at all
    "q247_svg_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id%3 = 0
        |    THEN CAST(n_chars%640 + 1 AS DOUBLE) END AS width,
        |  CASE WHEN doc_id%3 = 0
        |    THEN CAST(n_chars%480 + 1 AS DOUBLE) END AS height,
        |  CASE WHEN doc_id%3 = 1
        |    THEN CAST(n_chars%640 + 1 AS DOUBLE) END AS vb_width,
        |  CASE WHEN doc_id%3 = 1
        |    THEN CAST(n_chars%480 + 1 AS DOUBLE) END AS vb_height
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q248: counts by construction
    "q248_invisible_chars" ->
      """SELECT doc_id,
        |  CAST(doc_id%4 AS BIGINT) AS n_zero_width,
        |  CAST(CASE WHEN doc_id%3 = 0 THEN 1 ELSE 0 END AS BIGINT)
        |    AS n_bidi_controls,
        |  CAST(CASE WHEN doc_id%2 = 0 THEN 1 ELSE 0 END AS BIGINT)
        |    AS n_mixed_script_words,
        |  doc_id%4 > 0 OR doc_id%3 = 0 OR doc_id%2 = 0 AS suspicious
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q249: normalized keys written as plain ASCII; mapped counts by
    // construction
    "q249_homoglyph" ->
      """SELECT doc_id,
        |  CASE doc_id%3 WHEN 0 THEN 'paypal login' WHEN 1 THEN 'BAT MEH'
        |    ELSE 'clean text' END AS normalized,
        |  CAST(CASE doc_id%3 WHEN 0 THEN 2 WHEN 1 THEN 6 ELSE 0 END
        |    AS BIGINT) AS n_mapped,
        |  doc_id%3 <> 2 AS changed
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q250: dialect per shape; prose detects nothing
    "q250_csv_sniff" ->
      """SELECT doc_id,
        |  CASE doc_id%4 WHEN 0 THEN ',' WHEN 1 THEN ';'
        |    WHEN 2 THEN chr(9) END AS delimiter,
        |  CAST(CASE doc_id%4 WHEN 0 THEN 3 WHEN 1 THEN 3
        |    WHEN 2 THEN 2 END AS BIGINT) AS n_cols,
        |  doc_id%4 = 0 AS has_header,
        |  CAST(CASE doc_id%4 WHEN 0 THEN 3 ELSE 2 END AS BIGINT)
        |    AS n_lines_sampled
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q259: one fixed 4-column profile per doc; headerless docs
    // (doc_id%4=1) lose the names, nothing else changes
    "q259_csv_type_census" ->
      """WITH cols(col_idx, cname, n_int, n_double, n_bool, n_date,
        |  n_empty, t) AS (VALUES
        |  (0, 'id', 2, 0, 0, 0, 1, 'bigint'),
        |  (1, 'amount', 1, 2, 0, 0, 0, 'double'),
        |  (2, 'when', 0, 0, 0, 2, 1, 'date'),
        |  (3, 'ok', 0, 0, 3, 0, 0, 'boolean'))
        |SELECT doc_id, CAST(col_idx AS BIGINT) AS col_idx,
        |  CASE WHEN doc_id % 4 = 1 THEN NULL ELSE cname END AS col_name,
        |  CAST(3 AS BIGINT) AS n_values, CAST(n_int AS BIGINT) AS n_int,
        |  CAST(n_double AS BIGINT) AS n_double,
        |  CAST(n_bool AS BIGINT) AS n_bool,
        |  CAST(n_date AS BIGINT) AS n_date,
        |  CAST(n_empty AS BIGINT) AS n_empty,
        |  t AS inferred_type
        |FROM documents, cols ORDER BY doc_id, col_idx""".stripMargin,

    // q260: the two schema strings by header parity
    "q260_csv_schema" ->
      """SELECT doc_id, CASE WHEN doc_id % 4 = 1
        |  THEN 'c0 bigint, c1 double, c2 date, c3 boolean'
        |  ELSE 'id bigint, amount double, when date, ok boolean' END
        |  AS "schema"
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q251: key counts by construction (parseable docs only)
    "q251_json_keys" ->
      """WITH p AS (SELECT doc_id FROM documents WHERE doc_id%11 <> 0)
        |SELECT 'a' AS key, CAST(count(*) AS BIGINT) AS n_docs FROM p
        |UNION ALL
        |SELECT 'b', CAST(count(*) AS BIGINT) FROM p
        |UNION ALL
        |SELECT 'c', CAST(count(*) AS BIGINT) FROM p WHERE doc_id%2 = 0
        |ORDER BY key""".stripMargin,

    // q258: path/type counts by construction — e = valid even docs,
    // o = valid odd docs; every branch cast to BIGINT up front
    "q258_json_paths" ->
      """WITH d AS (SELECT doc_id % 11 = 0 AS bad, doc_id % 2 = 0 AS ev
        |  FROM documents),
        |c AS (SELECT count(*) FILTER (NOT bad AND ev) AS e,
        |             count(*) FILTER (NOT bad AND NOT ev) AS o FROM d)
        |SELECT path, n_total, n_object, n_array, n_string, n_number,
        |  n_bool, n_null FROM (
        |  SELECT 'a' AS path, e+o AS n_total, CAST(0 AS BIGINT) AS n_object,
        |    CAST(0 AS BIGINT) AS n_array, o AS n_string, e AS n_number,
        |    CAST(0 AS BIGINT) AS n_bool, CAST(0 AS BIGINT) AS n_null FROM c
        |  UNION ALL SELECT 'b', e, 0, 0, 0, 0, 0, e FROM c
        |  UNION ALL SELECT 'flag', o, 0, 0, 0, 0, o, 0 FROM c
        |  UNION ALL SELECT 'meta', e+o, e+o, 0, 0, 0, 0, 0 FROM c
        |  UNION ALL SELECT 'meta.deep', e, e, 0, 0, 0, 0, 0 FROM c
        |  UNION ALL SELECT 'meta.lang', e+o, 0, 0, e, 0, 0, o FROM c
        |  UNION ALL SELECT 'meta.tags', e, 0, e, 0, 0, 0, 0 FROM c)
        |ORDER BY path""".stripMargin,

    // q252: clean-then-window replayed over the same slice
    "q252_rag_pipeline" ->
      """WITH c AS (SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(substr(text, 1, 60),
        |      '<[^>]*>', ' ', 'g'), '[ \t\n\r]+', ' ', 'g')) AS t
        |  FROM documents),
        |d AS (SELECT doc_id, t, length(t) AS n FROM c),
        |u AS (SELECT doc_id, t,
        |    unnest(generate_series(0, CASE WHEN n <= 25 THEN 0
        |      ELSE CAST(ceil((n - 25)/20.0) AS BIGINT) END)) AS i
        |  FROM d WHERE n > 0)
        |SELECT doc_id, i AS chunk_idx, i*20 + 1 AS chunk_start,
        |  CAST(length(substr(t, CAST(i*20 + 1 AS INT), 25)) AS BIGINT)
        |    AS n_chunk_chars,
        |  substr(t, CAST(i*20 + 1 AS INT), 25) AS chunk
        |FROM u ORDER BY doc_id, chunk_idx""".stripMargin,

    // q253: only the MIT branch survives the license gate; every
    // number is fixture arithmetic (57-char text, 33/66 pivots)
    "q253_code_pipeline" ->
      """SELECT doc_id AS file_id, CAST(1 AS BIGINT) AS n_comment_lines,
        |  CAST(18 AS BIGINT) AS n_prefix, CAST(19 AS BIGINT) AS n_middle,
        |  CAST(20 AS BIGINT) AS n_suffix
        |FROM documents WHERE doc_id%3 = 0 ORDER BY file_id""".stripMargin,

    // q254: six fields per doc, written as literals (the quoted
    // values unescaped by construction)
    "q254_csv_parse" ->
      """SELECT doc_id, line_idx, col_idx, field FROM (
        |  SELECT doc_id, CAST(0 AS BIGINT) AS line_idx,
        |    CAST(0 AS BIGINT) AS col_idx, 'id' AS field FROM documents
        |  UNION ALL SELECT doc_id, 0, 1, 'name' FROM documents
        |  UNION ALL SELECT doc_id, 0, 2, 'notes' FROM documents
        |  UNION ALL SELECT doc_id, 1, 0, CAST(doc_id AS VARCHAR)
        |    FROM documents
        |  UNION ALL SELECT doc_id, 1, 1, 'Smith, John' FROM documents
        |  UNION ALL SELECT doc_id, 1, 2, 'said "hi"' FROM documents)
        |ORDER BY doc_id, line_idx, col_idx""".stripMargin,

    // q255: expected rows derived from the same arithmetic as the
    // fixture builder — the gzip wrap must be lossless, so the
    // corrupt-magic rows (all-null) are the only divergence
    "q255_warc_gzip" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 5 = 0 THEN NULL ELSE 'response' END
        |    AS warc_type,
        |  CASE WHEN doc_id % 5 = 0 THEN NULL
        |       ELSE 'https://site' || CAST(doc_id % 7 AS VARCHAR) ||
        |            '.example.com/p' || CAST(doc_id AS VARCHAR) END
        |    AS target_uri,
        |  CASE WHEN doc_id % 5 = 0 THEN NULL
        |       ELSE '2026-01-01T00:00:00Z' END AS warc_date,
        |  CASE WHEN doc_id % 5 = 0 THEN NULL
        |       ELSE CAST(n_chars AS BIGINT) END AS content_length,
        |  CASE WHEN doc_id % 5 = 0 THEN NULL ELSE 200 END AS http_status,
        |  CASE WHEN doc_id % 5 = 0 THEN NULL ELSE 'text/html' END
        |    AS content_type,
        |  CASE WHEN doc_id % 5 = 0 THEN NULL
        |       ELSE '<html>' || substr(text, 1, 40) || '</html>' END AS body
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q266: paragraphs to newlines, runs concatenated, entity
    // decoded; the missing-slide archives null
    "q266_pptx_text" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 7 = 0 THEN NULL
        |       ELSE 'Deck ' || CAST(doc_id AS VARCHAR) || chr(10) ||
        |            'Bullet & point' || chr(10) END AS slide_text
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q264: entry rows by construction — data offsets are fixed by
    // the 512-block layout (dir data empty, file data one block);
    // corrupted archives contribute nothing
    "q264_tar_entries" ->
      """SELECT doc_id, entry_idx, name, "offset", size, typeflag FROM (
        |  SELECT doc_id, CAST(0 AS BIGINT) AS entry_idx, 'src/' AS name,
        |    CAST(512 AS BIGINT) AS "offset", CAST(0 AS BIGINT) AS size,
        |    '5' AS typeflag FROM documents
        |  UNION ALL SELECT doc_id, 1, 'src/main.py', 1024,
        |    14 + strlen(CAST(doc_id AS VARCHAR)), '0' FROM documents
        |  UNION ALL SELECT doc_id, 2, 'README.md', 2048,
        |    least(strlen(text), 30), '0' FROM documents)
        |WHERE doc_id % 8 <> 0 ORDER BY doc_id, entry_idx""".stripMargin,

    // q275: each branch's text from its own tier's contract (pdf
    // show-op joining, docx paragraph newline, xlsx line-per-string,
    // pptx paragraph newline, epub htmlToText, gzip/raw passthrough,
    // unknown-kind zip = member texts joined by blank lines)
    "q275_document_text" ->
      """SELECT doc_id,
        |  CASE doc_id % 8 WHEN 0 THEN 'pdf' WHEN 2 THEN 'gzip'
        |    WHEN 3 THEN 'unknown'
        |    ELSE 'zip' END AS format,
        |  CASE doc_id % 8
        |    WHEN 0 THEN 'Doc ' || CAST(doc_id AS VARCHAR) || ' pdf'
        |    WHEN 1 THEN 'Doc ' || CAST(doc_id AS VARCHAR) || ' docx'
        |      || chr(10)
        |    WHEN 2 THEN 'Doc ' || CAST(doc_id AS VARCHAR) || ' gz plain'
        |    WHEN 4 THEN 'Sheet cell ' || CAST(doc_id AS VARCHAR) ||
        |      chr(10) || 'B ' || CAST(doc_id % 9 AS VARCHAR)
        |    WHEN 5 THEN 'Deck ' || CAST(doc_id AS VARCHAR) || ' slide'
        |      || chr(10)
        |    WHEN 6 THEN 'Book ' || CAST(doc_id AS VARCHAR) || ' chapter.'
        |    WHEN 7 THEN 'print(''doc ' || CAST(doc_id AS VARCHAR) ||
        |      ''')' || chr(10) || chr(10) || '# Project ' ||
        |      CAST(doc_id AS VARCHAR)
        |    ELSE 'Doc ' || CAST(doc_id AS VARCHAR) || ' raw text' END
        |    AS text
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q274: identifier rows by construction — doi first (match-pass
    // order), punctuation stripped, both arXiv forms
    "q274_citation_scan" ->
      """SELECT doc_id, pos, kind, ident FROM (
        |  SELECT doc_id, CAST(0 AS BIGINT) AS pos, 'doi' AS kind,
        |    '10.1234/abc.' || CAST(doc_id AS VARCHAR) AS ident
        |    FROM documents
        |  UNION ALL SELECT doc_id, 1, 'arxiv',
        |    '2301.0' || CAST(doc_id % 10 AS VARCHAR) || '123'
        |    FROM documents
        |  UNION ALL SELECT doc_id, 2, 'arxiv', 'math.GT/0309136'
        |    FROM documents)
        |ORDER BY doc_id, pos""".stripMargin,

    // q273: the embedded schema replayed verbatim; corrupt magics null
    "q273_avro_schema" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 4 = 3 THEN NULL
        |    ELSE '{"type":"record","name":"doc","fields":' ||
        |      '[{"name":"id","type":"long"},{"name":"t' ||
        |      CAST(doc_id AS VARCHAR) || '","type":"string"}]}' END
        |    AS avro_schema
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q272: Dublin Core fields from the builder; the misnamed-
    // container books null across the board
    "q272_epub_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 5 = 0 THEN NULL
        |       ELSE 'OEBPS/content.opf' END AS opf_path,
        |  CASE WHEN doc_id % 5 = 0 THEN NULL
        |       ELSE 'Book ' || CAST(doc_id AS VARCHAR) || ' & friends' END
        |    AS title,
        |  CASE WHEN doc_id % 5 = 0 THEN NULL
        |       ELSE 'Author ' || CAST(doc_id % 7 AS VARCHAR) END AS creator,
        |  CASE WHEN doc_id % 5 = 0 THEN NULL ELSE 'en' END AS language
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q271: the cleaning chain replayed over the same slice (q183's
    // parity class); r0/r2 collapse to one row, r3 never surfaces
    "q271_crawl_pipeline" ->
      """WITH c AS (SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(substr(text, 1, 20),
        |      '<[^>]*>', ' ', 'g'), ' +', ' ', 'g')) AS s
        |  FROM documents WHERE doc_id % 9 <> 0)
        |SELECT doc_id, page_text, first_rec, n_copies FROM (
        |  SELECT doc_id, s AS page_text, CAST(0 AS BIGINT) AS first_rec,
        |    CAST(2 AS BIGINT) AS n_copies FROM c
        |  UNION ALL SELECT doc_id, s || ' extra', 1, 1 FROM c)
        |ORDER BY doc_id, first_rec""".stripMargin,

    // q270: fields from the builder's arithmetic; model is never
    // present, the no-APP1 images all null
    "q270_jpeg_exif" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 10 = 0 THEN NULL
        |       ELSE CAST(doc_id % 8 + 1 AS INT) END AS orientation,
        |  CASE WHEN doc_id % 10 = 0 THEN NULL
        |       ELSE 'Cam ' || CAST(doc_id AS VARCHAR) END AS make,
        |  CAST(NULL AS VARCHAR) AS model,
        |  CASE WHEN doc_id % 10 = 0 THEN NULL
        |       ELSE '2026:01:02 03:04:05' END AS datetime
        |FROM documents ORDER BY media_id""".stripMargin,

    // q269: both cues per doc, milliseconds derived arithmetically,
    // declared indices pass through
    "q269_srt_parse" ->
      """SELECT doc_id, block_pos, cue_idx, start_ms, end_ms,
        |  end_ms - start_ms AS duration_ms, text FROM (
        |  SELECT doc_id, CAST(0 AS BIGINT) AS block_pos,
        |    CAST(1 AS BIGINT) AS cue_idx,
        |    CAST(doc_id % 60 * 1000 AS BIGINT) AS start_ms,
        |    CAST(doc_id % 60 * 1000 + 900 AS BIGINT) AS end_ms,
        |    'First sub for doc ' || CAST(doc_id AS VARCHAR) || '.' AS text
        |    FROM documents
        |  UNION ALL SELECT doc_id, 1, 3,
        |    CAST(doc_id % 10 * 60000 + 10500 AS BIGINT),
        |    CAST(doc_id % 10 * 60000 + 12750 AS BIGINT),
        |    'Second line one.' || chr(10) || 'Line two.' FROM documents)
        |ORDER BY doc_id, block_pos""".stripMargin,

    // q268: the two text frames in order; COMM never surfaces, the
    // absurd-size tags contribute nothing
    "q268_id3_tags" ->
      """SELECT doc_id AS media_id, pos, frame_id, text FROM (
        |  SELECT doc_id, CAST(0 AS BIGINT) AS pos, 'TIT2' AS frame_id,
        |    'Track ' || CAST(doc_id AS VARCHAR) AS text FROM documents
        |  UNION ALL SELECT doc_id, 1, 'TPE1', 'Artist & co'
        |    FROM documents)
        |WHERE doc_id % 6 <> 0 ORDER BY media_id, pos""".stripMargin,

    // q276: both files per surviving archive, languages by extension
    "q276_targz_code" ->
      """SELECT doc_id, path, ext, lang, lang_source FROM (
        |  SELECT doc_id, 'README.md' AS path, 'md' AS ext,
        |    'markdown' AS lang, 'ext' AS lang_source FROM documents
        |  UNION ALL SELECT doc_id, 'src/main.py', 'py', 'python', 'ext'
        |    FROM documents)
        |WHERE doc_id % 8 <> 0 ORDER BY doc_id, path""".stripMargin,

    // q277: the listing replayed arithmetically — DD archives get two
    // rows with CD-exact sizes, CD-less archives one fallback row,
    // corrupt-CD archives none
    "q277_zip_list" ->
      """WITH d AS (SELECT doc_id, doc_id % 4 + 1 AS k, doc_id % 3 AS m
        |  FROM documents)
        |SELECT doc_id, entry_idx, name, method, csize, usize, "offset"
        |FROM (
        |  SELECT doc_id, CAST(0 AS BIGINT) AS entry_idx, 'a.txt' AS name,
        |    CAST(0 AS INT) AS method, CAST(k AS BIGINT) AS csize,
        |    CAST(k AS BIGINT) AS usize, CAST(35 AS BIGINT) AS "offset"
        |  FROM d WHERE m = 0
        |  UNION ALL SELECT doc_id, 1, 'dir/b.bin', 0, k, k, 90 + k
        |  FROM d WHERE m = 0
        |  UNION ALL SELECT doc_id, 0, 'solo.txt', 0, k, k, 38
        |  FROM d WHERE m = 1)
        |ORDER BY doc_id, entry_idx""".stripMargin,

    // q278: the cell grid replayed arithmetically — A1 resolves the
    // doc's shared string by parity, B1/AA2 keep their <v> verbatim,
    // C2 is the decoded inline run, sheet2 only on %4 docs, %9 docs
    // have no sheet member at all
    "q278_xlsx_cells" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 9 <> 0)
        |SELECT doc_id, sheet, row, col, value FROM (
        |  SELECT doc_id, CAST(1 AS BIGINT) AS sheet, CAST(1 AS BIGINT)
        |      AS row, CAST(1 AS BIGINT) AS col,
        |    CASE WHEN doc_id % 2 = 0 THEN 'alpha ' || CAST(doc_id AS VARCHAR)
        |         ELSE 'beta two' END AS value FROM d
        |  UNION ALL SELECT doc_id, 1, 1, 2, '3.5' FROM d
        |  UNION ALL SELECT doc_id, 1, 2, 3, 'inl & ine' FROM d
        |  UNION ALL SELECT doc_id, 1, 2, 27,
        |    CAST(doc_id % 100 AS VARCHAR) FROM d
        |  UNION ALL SELECT doc_id, 2, 3, 2, '9' FROM d WHERE doc_id % 4 = 0)
        |ORDER BY doc_id, sheet, row, col""".stripMargin,

    // q279: spine rows replayed arithmetically; htmlToText's
    // whitespace collapse+trim replayed on the ch2 text slice
    "q279_epub_chapters" ->
      """SELECT doc_id, chapter_idx, href, text FROM (
        |  SELECT doc_id, CAST(0 AS BIGINT) AS chapter_idx,
        |    'ch1.xhtml' AS href,
        |    'Chapter one of book ' || CAST(doc_id AS VARCHAR) ||
        |      ' & intro.' AS text
        |  FROM documents
        |  UNION ALL SELECT doc_id, 1, 'ch2.xhtml',
        |    CASE WHEN doc_id % 6 = 0 THEN NULL
        |      ELSE trim(regexp_replace('Second ' || substr(text, 1, 20),
        |        ' +', ' ', 'g')) END
        |  FROM documents)
        |ORDER BY doc_id, chapter_idx""".stripMargin,

    // q280: the cleaned text reconstructed line by line — the last
    // line proves comments vanish (braces inside cannot poison the
    // template loop) and nowiki bodies stay LITERAL wiki markup
    "q280_wikitext_clean" ->
      """SELECT doc_id,
        |  'Intro to label ' || CAST(doc_id AS VARCHAR) ||
        |  ' and Other. After.' || chr(10) ||
        |  'Head ' || CAST(doc_id AS VARCHAR) || chr(10) ||
        |  'item ' || CAST(doc_id % 5 AS VARCHAR) || chr(10) ||
        |  'Text mid link ' || CAST(doc_id AS VARCHAR) || ' tail.' ||
        |  chr(10) || chr(10) ||
        |  'Tail ' || CAST(doc_id AS VARCHAR) || '.' || chr(10) ||
        |  'Keep {{l|' || CAST(doc_id % 5 AS VARCHAR) ||
        |  '}} and visible.' AS clean
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q281: the collapsed DDL derived independently from the fixture
    // design (every decision — majority, nullability, depth bound —
    // is fixed by construction, not replayed through the engine)
    "q281_json_infer_schema" ->
      """SELECT 'a double NOT NULL, b string, flag boolean NOT NULL, ' ||
        |  'meta struct<deep:map<string,string>,lang:string> NOT NULL, ' ||
        |  'tags array<string> NOT NULL' AS schema""".stripMargin,

    // q282: page rows replayed arithmetically (text lengths from the
    // builder's fixed-part counts + id width)
    "q282_wiki_pages" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS i
        |  FROM documents)
        |SELECT doc_id, pos, title, ns, page_id, redirect, text_len FROM (
        |  SELECT doc_id, CAST(0 AS BIGINT) AS pos,
        |    'Article ' || i AS title, CAST(0 AS INT) AS ns,
        |    CAST(doc_id AS BIGINT) AS page_id,
        |    CAST(NULL AS VARCHAR) AS redirect,
        |    CAST(62 + 2 * strlen(i) AS BIGINT) AS text_len FROM d
        |  UNION ALL SELECT doc_id, 1, 'Old ' || i, 0, doc_id + 1000000,
        |    'Article ' || i, 22 + strlen(i) FROM d
        |  UNION ALL SELECT doc_id, 2, 'Talk:X', 1, 7, NULL, 14 FROM d)
        |ORDER BY doc_id, pos""".stripMargin,

    // q283: the kept-corpus rows — one clean article per dump
    "q283_wiki_corpus" ->
      """SELECT doc_id, CAST(doc_id AS BIGINT) AS page_id,
        |  'Article ' || CAST(doc_id AS VARCHAR) AS title,
        |  'Article ' || CAST(doc_id AS VARCHAR) ||
        |    ' is about topic.' AS clean
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q284: the plaintexts the pinned streams compress — known
    // constants; concatenated streams (pbzip2/multistream shape)
    // decode back-to-back; the corrupt branch null
    "q284_bunzip2" ->
      """SELECT doc_id,
        |  CASE doc_id % 6
        |    WHEN 0 THEN 'hello bzip2 world'
        |    WHEN 1 THEN repeat('wiki dump text ', 40)
        |    WHEN 2 THEN repeat('a', 300) || 'end'
        |    WHEN 3 THEN ''
        |    WHEN 4 THEN 'hello bzip2 world' || repeat('wiki dump text ', 40)
        |    ELSE NULL END AS bz_text
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q321: body + aux texts replayed arithmetically; %3 docs body
    // only, %5 docs corrupt -> null
    "q321_docx_aux" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 5 = 0 THEN NULL
        |    WHEN doc_id % 3 = 0 THEN
        |      'Body ' || CAST(doc_id AS VARCHAR) || ' & text' || chr(10)
        |    ELSE
        |      'Body ' || CAST(doc_id AS VARCHAR) || ' & text' || chr(10)
        |      || chr(10) || 'Head ' || CAST(doc_id % 7 AS VARCHAR)
        |      || chr(10) || chr(10) || 'note A' || chr(10)
        |  END AS text
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q335: the native decoder's pinned constants replayed — the
    // python reference computed them independently
    // q340: the progressive fixture replays the q335 m1 constant —
    // same coefficients, different entropy layout; junk docs null
    "q340_jpeg_progressive" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0
        |    THEN CAST(-1166467901801136129 AS BIGINT) END AS dhash
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q335_jpeg_dhash" ->
      """SELECT doc_id,
        |  CASE doc_id % 4
        |    WHEN 0 THEN CAST(-1166467901801136257 AS BIGINT)
        |    WHEN 1 THEN CAST(-1166467901801136129 AS BIGINT)
        |    WHEN 2 THEN CAST(-1202496705279394050 AS BIGINT)
        |  END AS dhash
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q332: three VP8L shapes hash to the SAME constant the q320
    // GIF and q326 TIFF fixtures pin — cross-format by construction
    "q332_webp_dhash" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 5 <= 2
        |    THEN CAST(-1157460564566376449 AS BIGINT) END AS dhash
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q339: the census replayed — vids clock duration 10010 ms,
    // both stream headers; junk docs one null audit row
    "q339_avi_meta" ->
      """SELECT doc_id, width, height, total_frames, duration_ms,
        |  n_streams, pos, kind, handler, rate, scale, length
        |FROM (
        |  SELECT doc_id, 320 AS width, 240 AS height,
        |    CAST(250 AS BIGINT) AS total_frames,
        |    CAST(10010 AS BIGINT) AS duration_ms, 2 AS n_streams,
        |    CAST(0 AS BIGINT) AS pos, 'vids' AS kind, 'mjpg' AS handler,
        |    CAST(30000 AS BIGINT) AS rate, CAST(1001 AS BIGINT) AS scale,
        |    CAST(300 AS BIGINT) AS length
        |  FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL SELECT doc_id, 320, 240, 250, 10010, 2, 1,
        |    'auds', 'pcm ', 8000, 1, 80000
        |  FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL SELECT doc_id, NULL, NULL, NULL, NULL, NULL, 0,
        |    NULL, NULL, NULL, NULL, NULL
        |  FROM documents WHERE doc_id % 2 = 1)
        |ORDER BY doc_id, pos""".stripMargin,

    // q331: the census replayed — the spliced TrackNumber is
    // doc_id%5+1, matroska keeps the 1 ms default scale
    "q331_webm_meta" ->
      """SELECT doc_id, doctype, timescale_ns, duration_ms, pos,
        |  track_num, track_type, codec_id FROM (
        |  SELECT doc_id, 'webm' AS doctype,
        |    CAST(1000000 AS BIGINT) AS timescale_ns,
        |    CAST(5000 AS BIGINT) AS duration_ms, CAST(0 AS BIGINT) AS pos,
        |    CAST(doc_id % 5 + 1 AS BIGINT) AS track_num,
        |    'video' AS track_type, 'V_VP8' AS codec_id
        |  FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL SELECT doc_id, 'webm', 1000000, 5000, 1, 2,
        |    'audio', 'A_OPUS' FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL SELECT doc_id, 'matroska', 1000000, 1500, 0, 3,
        |    'subtitle', 'S_TEXT/UTF8' FROM documents WHERE doc_id % 3 = 1
        |  UNION ALL SELECT doc_id, NULL, NULL, NULL, 0, NULL, NULL, NULL
        |  FROM documents WHERE doc_id % 3 = 2)
        |ORDER BY doc_id, pos""".stripMargin,

    // q330: the census replayed — Vorbis granule/rate and Opus
    // (granule − pre-skip)/48k durations as constants, tags in order
    "q330_ogg_meta" ->
      """SELECT doc_id, codec, channels, sample_rate, duration_ms,
        |  pos, "key", "value" FROM (
        |  SELECT doc_id, 'vorbis' AS codec, CAST(2 AS INTEGER) AS channels,
        |    CAST(44100 AS BIGINT) AS sample_rate,
        |    CAST(2000 AS BIGINT) AS duration_ms,
        |    CAST(0 AS BIGINT) AS pos, 'TITLE' AS "key", 'Song A' AS "value"
        |  FROM documents WHERE doc_id % 4 = 0
        |  UNION ALL SELECT doc_id, 'vorbis', 2, 44100, 2000, 1,
        |    'ARTIST', 'V Art' FROM documents WHERE doc_id % 4 = 0
        |  UNION ALL SELECT doc_id, 'opus', 1, 24000, 1000, 0,
        |    'ENCODER', 'opusenc' FROM documents WHERE doc_id % 4 = 1
        |  UNION ALL SELECT doc_id, 'vorbis', 1, 8000, 500, 0, NULL, NULL
        |  FROM documents WHERE doc_id % 4 = 2
        |  UNION ALL SELECT doc_id, NULL, NULL, NULL, NULL, 0, NULL, NULL
        |  FROM documents WHERE doc_id % 4 = 3)
        |ORDER BY doc_id, pos""".stripMargin,

    // q337: the ObjStm-resolved text replays the q329 m0 shape with
    // n_streams = 3 (ObjStm + content + CMap); junk docs null
    "q337_pdf_objstm" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0
        |    THEN 'H' || chr(916) || ' ' ||
        |      lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
        |  END AS pdf_text,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST(3 AS BIGINT)
        |  END AS n_streams,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST(3 AS BIGINT)
        |  END AS n_decoded
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q329: CMap-resolved text replayed — 'H', U+0394 (chr 916) and
    // the two digit codes; the m1 tier replays latin1; junk null
    "q329_pdf_cid" ->
      """SELECT doc_id,
        |  CASE doc_id % 3
        |    WHEN 0 THEN 'H' || chr(916) || ' ' ||
        |      lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
        |    WHEN 1 THEN 'Plain ' || CAST(doc_id % 7 AS VARCHAR)
        |  END AS pdf_text,
        |  CASE doc_id % 3 WHEN 0 THEN CAST(2 AS BIGINT)
        |    WHEN 1 THEN CAST(1 AS BIGINT) END AS n_streams,
        |  CASE doc_id % 3 WHEN 0 THEN CAST(2 AS BIGINT)
        |    WHEN 1 THEN CAST(1 AS BIGINT) END AS n_decoded
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q328: tags replayed — fourcc keys verbatim, NULs stripped;
    // untagged docs vanish, junk docs one null audit row
    "q328_wav_info" ->
      """SELECT doc_id, pos, "key", "value" FROM (
        |  SELECT doc_id, CAST(0 AS BIGINT) AS pos, 'INAM' AS "key",
        |    'Track ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
        |      AS "value"
        |  FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL SELECT doc_id, 1, 'IART',
        |    'Artist ' || CAST(doc_id % 5 AS VARCHAR)
        |  FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL SELECT doc_id, 0, NULL, NULL
        |  FROM documents WHERE doc_id % 3 = 2)
        |ORDER BY doc_id, pos""".stripMargin,

    // q327: tags replayed — keys uppercased, the no-equals comment
    // skipped; untagged docs vanish, junk docs one null audit row
    "q327_flac_tags" ->
      """SELECT doc_id, pos, "key", "value" FROM (
        |  SELECT doc_id, CAST(0 AS BIGINT) AS pos, 'TITLE' AS "key",
        |    'Song ' || CAST(doc_id AS VARCHAR) AS "value"
        |  FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL SELECT doc_id, 1, 'ARTIST',
        |    'Artist ' || CAST(doc_id % 7 AS VARCHAR)
        |  FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL SELECT doc_id, 2, 'ALBUM', 'A&B'
        |  FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL SELECT doc_id, 0, NULL, NULL
        |  FROM documents WHERE doc_id % 3 = 2)
        |ORDER BY doc_id, pos""".stripMargin,

    // q336: all three compression tiers decode to the SAME pixel
    // grid, so the pinned q326 constant replays for doc_id % 4 < 3
    "q336_tiff_compressed" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 4 < 3
        |    THEN CAST(-1157460564566376449 AS BIGINT) END AS dhash
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q326: both polarities hash to the SAME python-computed constant
    // as the q320 GIF of the pattern — cross-format by construction
    "q326_tiff_dhash" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 < 2
        |    THEN CAST(-1157460564566376449 AS BIGINT) END AS dhash
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q325: the directory replayed — the zero width/height byte means
    // 256, the second payload carries the PNG signature
    "q325_ico_entries" ->
      """SELECT doc_id, entry_idx, width, height, bpp, size, is_png
        |FROM (
        |  SELECT doc_id, CAST(0 AS BIGINT) AS entry_idx, 16 AS width,
        |    16 AS height, 4 AS bpp, CAST(8 AS BIGINT) AS size,
        |    false AS is_png FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL SELECT doc_id, 1, 256, 256, 32, 12, true
        |  FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL SELECT doc_id, 0, NULL, NULL, NULL, NULL, NULL
        |  FROM documents WHERE doc_id % 2 = 1)
        |ORDER BY doc_id, entry_idx""".stripMargin,

    // q324: the census replayed — 3 frames at 40+60+100 ms loop 2,
    // the static VP8L one frame with no animation
    "q324_webp_frames" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 3 WHEN 1 THEN 1 END AS n_frames,
        |  CASE doc_id % 3 WHEN 0 THEN CAST(200 AS BIGINT)
        |    WHEN 1 THEN 0 END AS total_duration_ms,
        |  CASE doc_id % 3 WHEN 0 THEN 2 WHEN 1 THEN -1 END AS loop_count,
        |  CASE doc_id % 3 WHEN 0 THEN 'vp8x' WHEN 1 THEN 'vp8l' END
        |    AS variant
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q322: the census replayed as constants — 2 frames at 10+25 cs
    // with loop 3, the static image 1 frame with no GCE (loop -1)
    "q322_gif_frames" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 2 WHEN 1 THEN 1 END AS n_frames,
        |  CASE doc_id % 3 WHEN 0 THEN CAST(35 AS BIGINT)
        |    WHEN 1 THEN 0 END AS total_delay_cs,
        |  CASE doc_id % 3 WHEN 0 THEN 3 WHEN 1 THEN -1 END AS loop_count,
        |  CASE WHEN doc_id % 3 < 2 THEN '89a' END AS version
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q323: tab order replayed — rId2 resolves to sheet2, the ghost
    // r:id keeps a null file; corrupt docs vanish
    "q323_xlsx_sheets" ->
      """SELECT doc_id, pos, name, sheet_file FROM (
        |  SELECT doc_id, CAST(0 AS BIGINT) AS pos,
        |    'Data & more' AS name,
        |    'worksheets/sheet2.xml' AS sheet_file FROM documents
        |  UNION ALL SELECT doc_id, 1,
        |    'S' || CAST(doc_id % 7 AS VARCHAR),
        |    'worksheets/sheet1.xml' FROM documents
        |  UNION ALL SELECT doc_id, 2, 'Ghost', NULL FROM documents)
        |WHERE doc_id % 5 <> 0
        |ORDER BY doc_id, pos""".stripMargin,

    // q320: hashes replayed as the python-computed constants; the
    // palette-PNG branch (m2) equals the gifA hash BY CONTRACT
    "q320_gif_dhash" ->
      """SELECT doc_id,
        |  CASE doc_id % 4
        |    WHEN 0 THEN CAST(-1157460564566376449 AS BIGINT)
        |    WHEN 1 THEN CAST(-2604246222170760265 AS BIGINT)
        |    WHEN 2 THEN CAST(-1157460564566376449 AS BIGINT)
        |  END AS dhash
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q319: frames replayed arithmetically, duration = the same
    // integer floor the kernel computes (1152 samples/frame, 44.1k)
    "q319_mp3_duration" ->
      """WITH f AS (SELECT doc_id,
        |  CASE doc_id % 4
        |    WHEN 0 THEN 1000 + doc_id % 50
        |    WHEN 1 THEN 1 + doc_id % 8
        |    WHEN 2 THEN doc_id % 100 END AS fr,
        |  CASE doc_id % 4 WHEN 0 THEN 'xing' WHEN 1 THEN 'cbr'
        |    WHEN 2 THEN 'vbri' END AS method
        |  FROM documents)
        |SELECT doc_id, CAST(fr AS BIGINT) AS frames,
        |  CAST((fr * 1152 * 1000) // 44100 AS BIGINT) AS duration_ms,
        |  method
        |FROM f ORDER BY doc_id""".stripMargin,

    // q318: the grid replayed arithmetically — typed office:value
    // beats cell text, repeats expand, the covered cell and the empty
    // table shift col/sheet numbering, junk docs one null audit row
    "q318_ods_cells" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 4 <> 3)
        |SELECT doc_id, sheet, "row", col, value FROM (
        |  SELECT doc_id, CAST(1 AS BIGINT) AS sheet,
        |    CAST(1 AS BIGINT) AS "row", CAST(1 AS BIGINT) AS col,
        |    'alpha ' || CAST(doc_id AS VARCHAR) AS value FROM d
        |  UNION ALL SELECT doc_id, 1, 1, 2, '7' FROM d
        |  UNION ALL SELECT doc_id, 1, 1, 3, '7' FROM d
        |  UNION ALL SELECT doc_id, 1, 1, 5, 'end & fin' FROM d
        |  UNION ALL SELECT doc_id, 1, 2, 2,
        |    CAST(doc_id % 9 AS VARCHAR) FROM d
        |  UNION ALL SELECT doc_id, 1, 3, 2,
        |    CAST(doc_id % 9 AS VARCHAR) FROM d
        |  UNION ALL SELECT doc_id, 3, 1, 1, 's2' FROM d
        |  UNION ALL SELECT doc_id, NULL, NULL, NULL, NULL
        |  FROM documents WHERE doc_id % 4 = 3)
        |ORDER BY doc_id, sheet, "row", col""".stripMargin,

    // q317: listing + extracted member text replayed as constants;
    // directories carry null text, the CRC-flip branch one null row
    "q317_7z_members" ->
      """SELECT doc_id, name, CAST(size AS BIGINT) AS size, is_dir,
        |  t.text AS text
        |FROM documents, (VALUES
        |  ('README', 16, false, 'readme text body'),
        |  ('src', 0, true, NULL),
        |  ('src/main.py', 18, false,
        |   'print(''hello 7z'')' || chr(10))) AS t(name, size, is_dir, text)
        |WHERE doc_id % 2 = 0
        |UNION ALL
        |SELECT doc_id, NULL, NULL, NULL, NULL FROM documents
        |WHERE doc_id % 2 = 1
        |ORDER BY doc_id, name""".stripMargin,

    // q316: the listing replayed as constants; CRC-flip docs keep one
    // null audit row
    "q316_7z_list" ->
      """SELECT doc_id, name, CAST(size AS BIGINT) AS size, is_dir
        |FROM documents, (VALUES
        |  ('README', 16, false), ('src', 0, true),
        |  ('src/main.py', 18, false)) AS t(name, size, is_dir)
        |WHERE doc_id % 2 = 0
        |UNION ALL
        |SELECT doc_id, NULL, NULL, NULL FROM documents
        |WHERE doc_id % 2 = 1
        |ORDER BY doc_id, name""".stripMargin,

    // q315: the extracted texts replayed as constants; corrupt null
    "q315_odf_text" ->
      """SELECT doc_id,
        |  CASE doc_id % 3
        |    WHEN 0 THEN 'Titre & plus' || chr(10) ||
        |      'First par with nested ü run.' || chr(10) ||
        |      'Second par.' || chr(10)
        |    WHEN 1 THEN 'cell A1' || chr(10) || '42' || chr(10)
        |    ELSE NULL END AS odf_text,
        |  CASE doc_id % 3 WHEN 0 THEN 'text' WHEN 1 THEN 'spreadsheet'
        |    ELSE NULL END AS odf_kind
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q314: the footer facts replayed as constants; corrupt docs null
    "q314_arrow_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST(4 AS INT) END AS version,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST(0 AS INT) END
        |    AS n_dictionaries,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST(2 AS INT) END
        |    AS n_record_batches,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST(104 AS BIGINT) END
        |    AS total_body_bytes,
        |  CASE WHEN doc_id % 2 = 0 THEN 'id;name;x' END AS cols
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q313: the three items' renderings replayed as constants
    "q313_cbor" ->
      """SELECT doc_id, rec FROM (
        |  SELECT doc_id, '{"a":1,"b":[2,3]}' AS rec FROM documents
        |  WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id, '{"tx":[4,5],"k":"ab"}' FROM documents
        |  WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id, '1363896240' FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id, NULL FROM documents WHERE doc_id % 2 = 1)
        |ORDER BY doc_id, rec""".stripMargin,

    // q312: both pinned files carry the SAME logical data (codecs
    // differ), so their stats rows coincide; corrupt docs keep one
    // null audit row
    "q312_orc_column_stats" ->
      """SELECT doc_id, CAST(col AS INT) AS "column",
        |  CAST(n_values AS BIGINT) AS n_values, has_null,
        |  CAST(int_min AS BIGINT) AS int_min,
        |  CAST(int_max AS BIGINT) AS int_max, str_min, str_max
        |FROM documents, (VALUES
        |  (0, 5, false, NULL, NULL, NULL, NULL),
        |  (1, 5, false, 0, 4, NULL, NULL),
        |  (2, 5, false, NULL, NULL, 'a', 'e'))
        |  AS t(col, n_values, has_null, int_min, int_max, str_min,
        |       str_max)
        |WHERE doc_id % 3 IN (0, 1)
        |UNION ALL
        |SELECT doc_id, NULL, NULL, NULL, NULL, NULL, NULL, NULL
        |FROM documents WHERE doc_id % 3 = 2
        |ORDER BY doc_id, "column"""".stripMargin,

    // q311: the census rows replayed as constants; the group-wire
    // branch keeps one null audit row
    "q311_proto_fields" ->
      """SELECT doc_id, path, kind,
        |  CAST(count AS BIGINT) AS count,
        |  CAST(total_bytes AS BIGINT) AS total_bytes
        |FROM documents, (VALUES
        |  ('1', 'varint', 2, 0), ('2', 'string', 1, 7),
        |  ('3', 'message', 1, 11), ('3.1', 'varint', 1, 0),
        |  ('3.2', 'fixed64', 1, 0), ('4', 'fixed32', 1, 0),
        |  ('5', 'bytes', 1, 2)) AS t(path, kind, count, total_bytes)
        |WHERE doc_id % 2 = 0
        |UNION ALL
        |SELECT doc_id, NULL, NULL, NULL, NULL FROM documents
        |WHERE doc_id % 2 = 1
        |ORDER BY doc_id, path, kind""".stripMargin,

    // q310: the two values' JSON renderings replayed as constants
    "q310_msgpack" ->
      """SELECT doc_id, rec FROM (
        |  SELECT doc_id, '{"a":1,"t":"x"}' AS rec FROM documents
        |  WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id, '{"a":2,"t":"ü","xs":[1,null]}' FROM documents
        |  WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id, NULL FROM documents WHERE doc_id % 2 = 1)
        |ORDER BY doc_id, rec""".stripMargin,

    // q309: the two documents' JSON renderings replayed as constants
    "q309_bson" ->
      """SELECT doc_id, rec FROM (
        |  SELECT doc_id,
        |    '{"a":1,"t":"x","id":"0102030405060708090a0b0c"}' AS rec
        |  FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id,
        |    '{"a":2,"t":"ü & y","sub":{"z":3},"arr":[1.5]}'
        |  FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id, NULL FROM documents WHERE doc_id % 2 = 1)
        |ORDER BY doc_id, rec""".stripMargin,

    // q308: the pinned files' single stripes replayed as constants;
    // the corrupt branch keeps one null audit row
    "q308_orc_stripes" ->
      """SELECT doc_id,
        |  CAST(0 AS BIGINT) AS stripe_idx,
        |  CASE WHEN doc_id % 3 IN (0, 1) THEN CAST(3 AS BIGINT)
        |    ELSE NULL END AS offset,
        |  CASE doc_id % 3 WHEN 0 THEN CAST(51 AS BIGINT)
        |    WHEN 1 THEN 63 ELSE NULL END AS index_length,
        |  CASE doc_id % 3 WHEN 0 THEN CAST(15 AS BIGINT)
        |    WHEN 1 THEN 26 ELSE NULL END AS data_length,
        |  CASE WHEN doc_id % 3 IN (0, 1) THEN CAST(5 AS BIGINT)
        |    ELSE NULL END AS number_of_rows
        |FROM documents ORDER BY doc_id, stripe_idx""".stripMargin,

    // q307: the synthesized timeline's write stats replayed — only
    // completed commit-class instants contribute
    "q307_hudi_commits" ->
      """SELECT * FROM (VALUES
        |  ('001', 'commit', 'lang=de', 'f2-001',
        |   'lang=de/f2-001.parquet', CAST(50 AS BIGINT),
        |   CAST(5 AS BIGINT), CAST(500 AS BIGINT), CAST(500 AS BIGINT)),
        |  ('001', 'commit', 'lang=en', 'f1-001',
        |   'lang=en/f1-001.parquet', CAST(100 AS BIGINT),
        |   CAST(0 AS BIGINT), CAST(1000 AS BIGINT), CAST(1000 AS BIGINT)),
        |  ('002', 'deltacommit', 'lang=de', 'f2-002',
        |   'lang=de/f2-002.parquet', CAST(50 AS BIGINT),
        |   CAST(5 AS BIGINT), CAST(500 AS BIGINT), CAST(500 AS BIGINT)),
        |  ('002', 'deltacommit', 'lang=en', 'f1-002',
        |   'lang=en/f1-002.parquet', CAST(100 AS BIGINT),
        |   CAST(0 AS BIGINT), CAST(1000 AS BIGINT), CAST(1000 AS BIGINT)))
        |AS t(instant_ts, action, partition, file_id, path, num_writes,
        |     num_deletes, total_write_bytes, file_size_in_bytes)
        |ORDER BY instant_ts, partition""".stripMargin,

    // q305/q306: the framed plaintexts replayed as constants; the
    // corrupt branches null
    "q305_lz4" ->
      """SELECT doc_id,
        |  CASE doc_id % 3
        |    WHEN 0 THEN 'hello lz4 frame' || 'hello lz4 frame' || 'Z'
        |    WHEN 1 THEN 'checksummed lz4'
        |    ELSE NULL END AS lz4_text
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q306_snappy_frame" ->
      """SELECT doc_id,
        |  CASE doc_id % 2 WHEN 0 THEN 'snappy framed text tail'
        |    ELSE NULL END AS sz_text
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q303: the two records' JSON renderings replayed as constants;
    // corrupt docs keep one null audit row
    "q303_avro_records" ->
      """SELECT doc_id, rec FROM (
        |  SELECT doc_id,
        |    '{"id":1,"tag":"a","xs":[1,2]}' AS rec FROM documents
        |    WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id, '{"id":2,"tag":null,"xs":[]}' FROM documents
        |    WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id, NULL FROM documents WHERE doc_id % 2 = 1)
        |ORDER BY doc_id, rec""".stripMargin,

    // q304: the synthesized table's live files replayed — deleted
    // entries and the v2 delete file excluded by construction
    "q304_iceberg_snapshot" ->
      """SELECT * FROM (VALUES
        |  ('data/a.parquet', 'PARQUET', CAST(100 AS BIGINT),
        |   CAST(1000 AS BIGINT)),
        |  ('data/b.parquet', 'PARQUET', CAST(200 AS BIGINT),
        |   CAST(2000 AS BIGINT)))
        |AS t(file_path, file_format, record_count, file_size_in_bytes)
        |ORDER BY file_path""".stripMargin,

    // q302: the pinned containers' framing replayed as constants;
    // the corrupt-sync branch keeps a null audit row
    "q302_avro_blocks" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'deflate' WHEN 1 THEN 'null'
        |    ELSE NULL END AS codec,
        |  CASE doc_id % 3 WHEN 0 THEN CAST(2 AS BIGINT)
        |    WHEN 1 THEN 1 ELSE NULL END AS n_blocks,
        |  CASE doc_id % 3 WHEN 0 THEN CAST(5 AS BIGINT)
        |    WHEN 1 THEN 7 ELSE NULL END AS n_records,
        |  CASE doc_id % 3 WHEN 0 THEN CAST(5 AS BIGINT)
        |    WHEN 1 THEN 2 ELSE NULL END AS data_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q301: the deck's text atoms replayed as constants — both
    // poisoned branches null
    "q301_ppt_text" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0
        |    THEN 'Unicode slide — ünïcode ✓' || chr(10) ||
        |      'second line' || chr(10) || 'Bytes title' || chr(10) ||
        |      'subtitle' || chr(10)
        |    ELSE NULL END AS ppt_text
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q299/q300: the synthesized log's replay replayed — live set and
    // per-commit audit fixed by construction
    "q299_delta_snapshot" ->
      """SELECT * FROM (VALUES
        |  ('lang=de/c.parquet', CAST(300 AS BIGINT), CAST(21 AS BIGINT),
        |   'de', CAST(1 AS BIGINT)),
        |  ('lang=en/a.parquet', CAST(150 AS BIGINT), CAST(31 AS BIGINT),
        |   'en', CAST(2 AS BIGINT)))
        |AS t(path, size, modification_time, lang, added_version)
        |ORDER BY path""".stripMargin,

    "q300_delta_history" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), CAST(2 AS BIGINT), CAST(300 AS BIGINT),
        |   CAST(0 AS BIGINT)),
        |  (CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(300 AS BIGINT),
        |   CAST(1 AS BIGINT)),
        |  (CAST(2 AS BIGINT), CAST(1 AS BIGINT), CAST(150 AS BIGINT),
        |   CAST(1 AS BIGINT)))
        |AS t(version, n_added, bytes_added, n_removed)
        |ORDER BY version""".stripMargin,

    // q298: the engine-built workbooks' cells replayed as literals —
    // every value fixed by construction (RK packings, formula cached
    // results, the CONTINUE-split SST string); corrupt docs keep one
    // all-null audit row
    "q298_xls_cells" ->
      """WITH d AS (SELECT doc_id, doc_id % 3 AS m FROM documents),
        |cells(m, sheet, r, c, v) AS (SELECT * FROM (VALUES
        |  (0,1,1,1,'hello'),(0,1,1,2,'wörld ✓'),(0,1,2,1,'3.25'),
        |  (0,1,2,2,'42'),(0,1,2,3,'1.23'),(0,1,2,4,'2.5'),
        |  (0,1,3,1,'1'),(0,1,3,2,'2'),(0,1,3,3,'3'),
        |  (0,1,4,1,'TRUE'),(0,1,4,2,'#DIV/0!'),
        |  (0,1,5,1,'7.5'),(0,1,5,2,'fx'),(0,1,5,3,'TRUE'),(0,1,5,4,''),
        |  (0,1,6,1,'inline'),(0,2,1,1,'rich'),
        |  (1,1,1,1,'aaaaБВГДЕЖ'),(1,1,1,2,'tail')) t)
        |SELECT doc_id, CAST(sheet AS BIGINT) AS sheet,
        |  CAST(r AS BIGINT) AS "row", CAST(c AS BIGINT) AS col,
        |  v AS value
        |FROM d JOIN cells ON cells.m = d.m
        |UNION ALL
        |SELECT doc_id, NULL, NULL, NULL, NULL FROM d WHERE m = 2
        |ORDER BY doc_id, sheet, "row", col""".stripMargin,

    // q290: the plaintexts the pinned zstd streams compress — known
    // constants; concatenated frames and skippable frames decode per
    // the multi-frame contract; the corrupt branch null
    "q290_zstd" ->
      """SELECT doc_id,
        |  CASE doc_id % 7
        |    WHEN 0 THEN 'hello zstd world'
        |    WHEN 1 THEN repeat('wiki dump text ', 40)
        |    WHEN 2 THEN repeat('a', 300) || 'end'
        |    WHEN 3 THEN ''
        |    WHEN 4 THEN 'hello zstd world' || repeat('wiki dump text ', 40)
        |    WHEN 5 THEN 'hello zstd world' || repeat('a', 300) || 'end'
        |    ELSE NULL END AS z_text
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q291: the shard rows replayed as constants — the bit-flipped
    // shard contributes nothing, the malformed line quarantines
    "q291_jsonl_zst" ->
      """SELECT * FROM (VALUES
        |  (CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        |   CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
        |   CAST(NULL AS BIGINT), TRUE),
        |  (CAST(1 AS BIGINT), 'alpha one', 'en', 'web',
        |   CAST(9 AS BIGINT), FALSE),
        |  (CAST(2 AS BIGINT), 'beta two', 'de', 'web',
        |   CAST(8 AS BIGINT), FALSE),
        |  (CAST(3 AS BIGINT), 'gamma three', 'en', 'book',
        |   CAST(11 AS BIGINT), FALSE),
        |  (CAST(9 AS BIGINT), 'ok row', 'fr', 'web',
        |   CAST(6 AS BIGINT), FALSE))
        |  AS t(doc_id, text, lang, source, n_chars, quarantined)
        |ORDER BY coalesce(doc_id, -1)""".stripMargin,

    // q285: member texts replayed arithmetically; the docs/ directory
    // entry never surfaces
    "q285_zip_texts" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS i,
        |  doc_id % 4 + 1 AS k FROM documents)
        |SELECT doc_id, name, usize, text FROM (
        |  SELECT doc_id, 'docs/read.txt' AS name,
        |    CAST(6 + strlen(i) AS BIGINT) AS usize,
        |    'alpha ' || i AS text FROM d WHERE doc_id % 2 = 0
        |  UNION ALL SELECT doc_id, 'notes.md',
        |    5 + strlen(CAST(doc_id % 7 AS VARCHAR)),
        |    'note ' || CAST(doc_id % 7 AS VARCHAR) FROM d
        |  WHERE doc_id % 2 = 0
        |  UNION ALL SELECT doc_id, 'a.txt', k, repeat('D', CAST(k AS INT))
        |  FROM d WHERE doc_id % 2 = 1
        |  UNION ALL SELECT doc_id, 'dir/b.bin', k,
        |    repeat('D', CAST(k AS INT)) FROM d WHERE doc_id % 2 = 1)
        |ORDER BY doc_id, name""".stripMargin,

    // q338: the page values replayed — id 0..6, name n0..n6, both
    // snappy RLE_DICTIONARY; junk docs one null audit row
    "q338_parquet_page" ->
      """SELECT doc_id, ptype, codec, encoding, num_values, pos, "value"
        |FROM (
        |  SELECT doc_id, 'int64' AS ptype, 'snappy' AS codec,
        |    'rle_dictionary' AS encoding, CAST(7 AS BIGINT) AS num_values,
        |    CAST(r.range AS BIGINT) AS pos,
        |    CAST(r.range AS VARCHAR) AS "value"
        |  FROM documents, range(7) r WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id, 'byte_array', 'snappy', 'rle_dictionary', 7,
        |    r.range, 'n' || CAST(r.range AS VARCHAR)
        |  FROM documents, range(7) r WHERE doc_id % 3 = 1
        |  UNION ALL
        |  SELECT doc_id, NULL, NULL, NULL, NULL, 0, NULL
        |  FROM documents WHERE doc_id % 3 = 2)
        |ORDER BY doc_id, pos""".stripMargin,

    // q286: the footer facts replayed as constants (pyarrow wrote
    // the files; every value known by construction), corrupt null
    "q286_parquet_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 2 THEN NULL ELSE 2 END AS version,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 7 WHEN 1 THEN 3
        |    ELSE NULL END AS BIGINT) AS num_rows,
        |  CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 2
        |    ELSE NULL END AS n_row_groups,
        |  CASE WHEN doc_id % 3 = 2 THEN NULL
        |    ELSE 'parquet-cpp-arrow version 16.1.0' END AS created_by,
        |  CASE doc_id % 3 WHEN 0 THEN 2 WHEN 1 THEN 4
        |    ELSE NULL END AS n_cols,
        |  CASE doc_id % 3
        |    WHEN 0 THEN 'id:int64:optional;name:byte_array:optional'
        |    WHEN 1 THEN 'k:int32:optional;meta.lang:byte_array:optional;'
        |      || 'meta.score:double:optional;opt:byte_array:optional'
        |    ELSE NULL END AS cols_ddl
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q295: the plaintexts the pinned xz streams compress — known
    // constants; concatenated + multi-block streams decode; the
    // corrupt branch null
    "q295_xz" ->
      """SELECT doc_id,
        |  CASE doc_id % 6
        |    WHEN 0 THEN 'hello zstd world'
        |    WHEN 1 THEN repeat('wiki dump text ', 40)
        |    WHEN 2 THEN repeat('a', 300) || 'end'
        |    WHEN 3 THEN ''
        |    WHEN 4 THEN 'hello zstd world' || repeat('a', 300) || 'end'
        |    ELSE NULL END AS xz_text
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q297: the rendered text derived arithmetically (delimiter-space
    // swallows, hex/unicode escapes, destination drop all replayed as
    // constants); unbalanced docs null
    "q297_rtf_text" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 4 = 3 THEN NULL
        |    ELSE 'Doc ' || CAST(doc_id AS VARCHAR) || ' body café €' ||
        |      CAST(doc_id % 9 AS VARCHAR) || '.' || chr(10) ||
        |      'Tail ' || CAST(doc_id AS VARCHAR) || '.' || chr(10)
        |    END AS rtf_text
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q296: the piece texts replayed as constants (the fixture is
    // static by construction); encrypted + corrupt branches null
    "q296_doc_text" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0
        |    THEN 'Legacy Word text. Café résumé.' || chr(10) ||
        |      'Unicode piece — ünïcode.' || chr(10)
        |    ELSE NULL END AS doc_text
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q294: the directory replayed arithmetically (every field of the
    // engine-built compound file is fixed by construction except the
    // stream size, derived from the text length); corrupt docs keep
    // one all-null audit row
    "q294_cfb_meta" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS i,
        |  doc_id % 3 AS m FROM documents)
        |SELECT * FROM (
        |  SELECT doc_id, CASE m WHEN 0 THEN 'doc' ELSE 'xls' END AS kind,
        |    CAST(3 AS INT) AS major, CAST(512 AS INT) AS sector_size,
        |    CAST(0 AS BIGINT) AS entry_idx, 'Root Entry' AS name,
        |    'root' AS otype, CAST(0 AS BIGINT) AS start_sector,
        |    CAST(0 AS BIGINT) AS size FROM d WHERE m <> 2
        |  UNION ALL
        |  SELECT doc_id, CASE m WHEN 0 THEN 'doc' ELSE 'xls' END, 3, 512,
        |    1, CASE m WHEN 0 THEN 'WordDocument' ELSE 'Workbook' END,
        |    'stream', 2,
        |    CASE m WHEN 0 THEN 17 + strlen(i) ELSE 12 + strlen(i) END
        |    FROM d WHERE m <> 2
        |  UNION ALL
        |  SELECT doc_id, CASE m WHEN 0 THEN 'doc' ELSE 'xls' END, 3, 512,
        |    2, chr(5) || 'SummaryInformation', 'stream', 4294967294, 0
        |    FROM d WHERE m <> 2
        |  UNION ALL
        |  SELECT doc_id, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL
        |    FROM d WHERE m = 2)
        |ORDER BY doc_id, coalesce(entry_idx, -1)""".stripMargin,

    // q293: both messages' rows derived arithmetically — the QP/
    // base64/2047 decodes and the reply-strip all replayed as
    // constants; preamble junk contributes nothing
    "q293_mbox_corpus" ->
      """SELECT * FROM (
        |  SELECT doc_id, CAST(0 AS BIGINT) AS msg_idx,
        |    'Re: topic ' || CAST(doc_id AS VARCHAR) AS subject,
        |    'Alice <alice@x.io>' AS from_addr,
        |    'Thu, 01 Jan 2026 00:00:00 +0000' AS date_raw,
        |    'Hello doc = ' || CAST(doc_id AS VARCHAR) || chr(10) ||
        |      'From here' || chr(10) || 'bye' AS cleaned,
        |    CAST(4 AS BIGINT) AS n_lines, CAST(1 AS BIGINT) AS n_quoted,
        |    CAST(0 AS BIGINT) AS n_signature
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, 1, 'Bü ' || CAST(doc_id % 7 AS VARCHAR),
        |    'Bob <bob@y.io>', 'Fri, 02 Jan 2026 00:00:00 +0000',
        |    'plain body ' || CAST(doc_id AS VARCHAR), 1, 0, 0
        |  FROM documents)
        |ORDER BY doc_id, msg_idx""".stripMargin,

    // q292: every per-chunk statistic replayed as constants (pyarrow
    // wrote the file; stats known by construction); corrupt docs keep
    // one all-null row
    "q292_parquet_stats" ->
      """WITH chunks AS (SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), 0, CAST(4 AS BIGINT), CAST(311 AS BIGINT),
        |   'id', 'int64', 'snappy', CAST(4 AS BIGINT),
        |   CAST(115 AS BIGINT), CAST(117 AS BIGINT), CAST(0 AS BIGINT),
        |   '1', '4'),
        |  (1, 0, 4, 311, 'name', 'byte_array', 'snappy', 4, 89, 85, 1,
        |   'alpha', 'delta'),
        |  (2, 0, 4, 311, 'score', 'double', 'snappy', 4, 109, 109, 1,
        |   '-2.25', '3.75'),
        |  (3, 1, 3, 287, 'id', 'int64', 'snappy', 3, 104, 100, 1,
        |   '6', '7'),
        |  (4, 1, 3, 287, 'name', 'byte_array', 'snappy', 3, 82, 78, 0,
        |   'eps', 'zeta'),
        |  (5, 1, 3, 287, 'score', 'double', 'snappy', 3, 109, 109, 0,
        |   '-1.0', '9.0'))
        |  AS t(pos, row_group, rg_rows, rg_bytes, path, ptype, codec,
        |       num_values, compressed_bytes, uncompressed_bytes,
        |       null_count, min_value, max_value))
        |SELECT * FROM (
        |  SELECT d.doc_id, c.* FROM documents d CROSS JOIN chunks c
        |    WHERE d.doc_id % 4 <> 3
        |  UNION ALL
        |  SELECT doc_id, CAST(NULL AS BIGINT), CAST(NULL AS INT),
        |    CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
        |    CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
        |    CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
        |    CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
        |    CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
        |    CAST(NULL AS VARCHAR)
        |  FROM documents WHERE doc_id % 4 = 3)
        |ORDER BY doc_id, coalesce(pos, -1)""".stripMargin,

    // q342: stripe-0 values replayed literally — pyarrow wrote the
    // five files with known content (the zstd one shifted by
    // construction); corrupt docs keep one null audit row
    "q342_orc_values" ->
      """SELECT doc_id, codec, encoding, n_values, pos, id_val,
        |  name_val FROM (
        |  SELECT doc_id,
        |    CASE doc_id % 6 WHEN 0 THEN 'none' WHEN 1 THEN 'zlib'
        |      WHEN 2 THEN 'snappy' WHEN 3 THEN 'lz4' ELSE 'zstd'
        |      END AS codec,
        |    'direct_v2' AS encoding, CAST(5 AS BIGINT) AS n_values,
        |    CAST(p.pos AS BIGINT) AS pos,
        |    CAST(CASE WHEN doc_id % 6 = 4 THEN p.pos + 1 ELSE p.pos
        |      END AS VARCHAR) AS id_val,
        |    CASE WHEN doc_id % 6 = 4
        |      THEN (['a','ab','abc','dd','e'])[p.pos + 1]
        |      ELSE (['a','bb','c','dd','e'])[p.pos + 1]
        |      END AS name_val
        |  FROM documents, (SELECT unnest(range(5)) AS pos) p
        |  WHERE doc_id % 6 <> 5
        |  UNION ALL SELECT doc_id, NULL, NULL, NULL,
        |    CAST(0 AS BIGINT), NULL, NULL
        |  FROM documents WHERE doc_id % 6 = 5)
        |ORDER BY doc_id, pos""".stripMargin,

    // q287: the tail facts replayed as constants (pyarrow wrote the
    // files; every value known by construction), corrupt null
    "q287_orc_meta" ->
      """SELECT doc_id,
        |  CASE doc_id % 6 WHEN 0 THEN 'none' WHEN 1 THEN 'zlib'
        |    WHEN 2 THEN 'snappy' WHEN 3 THEN 'lz4' WHEN 4 THEN 'zstd'
        |    ELSE NULL END AS compression,
        |  CAST(CASE WHEN doc_id % 6 = 5 THEN NULL ELSE 5 END AS BIGINT)
        |    AS num_rows,
        |  CASE WHEN doc_id % 6 = 5 THEN NULL ELSE 1 END AS n_stripes,
        |  CASE WHEN doc_id % 6 = 5 THEN NULL ELSE 2 END AS n_cols,
        |  CASE WHEN doc_id % 6 = 5 THEN NULL
        |    ELSE 'id:long;name:string' END AS cols_ddl
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q288: index rows replayed arithmetically; the junk line keeps
    // its row with null fields
    "q288_cdxj_parse" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS i
        |  FROM documents)
        |SELECT doc_id, pos, surt, ts, url, status, mime, digest,
        |  length, "offset", filename FROM (
        |  SELECT doc_id, CAST(0 AS BIGINT) AS pos,
        |    'com,example)/p' || i AS surt, '20260101000000' AS ts,
        |    'https://example.com/p' || i AS url, CAST(200 AS INT)
        |      AS status, 'text/html' AS mime,
        |    'sha1:AB' || CAST(doc_id % 16 AS VARCHAR) AS digest,
        |    CAST(1234 AS BIGINT) AS length,
        |    CAST(doc_id * 100 AS BIGINT) AS "offset",
        |    'crawl-00.warc.gz' AS filename FROM d
        |  UNION ALL SELECT doc_id, 1, 'org,site)/x', '20260102000000',
        |    'https://site.org/x', 404, 'text/plain', NULL, 9, 77,
        |    'crawl-01.warc.gz' FROM d
        |  UNION ALL SELECT doc_id, 2, NULL, NULL, NULL, NULL, NULL,
        |    NULL, NULL, NULL, NULL FROM d)
        |ORDER BY doc_id, pos""".stripMargin,

    // q289: header facts replayed arithmetically; %5 docs null
    // q341: the docs rows replayed literally — note the REAL
    // library packed integral floats (1e10, 2.0) as INTEGERs
    "q341_sqlite_rows" ->
      """SELECT doc_id, root_page, n_rows, pos, rowid, a, b, c, d
        |FROM (
        |  SELECT doc_id, 2 AS root_page, CAST(11 AS BIGINT) AS n_rows,
        |    CAST(0 AS BIGINT) AS pos, CAST(1 AS BIGINT) AS rowid,
        |    CAST(NULL AS VARCHAR) AS a, '0.25' AS b, 'hello' AS c,
        |    '0102' AS d FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL SELECT doc_id, 2, 11, 1, 2, '0', NULL, '', ''
        |  FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL SELECT doc_id, 2, 11, 2, 3, '1', '-1.5', 'café', NULL
        |  FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL SELECT doc_id, 2, 11, 3, 4, '127', '10000000000', 'xxxxxxxxxxxxxxxxxxxxxxxxxxxxxx', 'ff'
        |  FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL SELECT doc_id, 2, 11, 4, 5, '-129', NULL, NULL, '0010'
        |  FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL SELECT doc_id, 2, 11, 5, 6, '32767', '2', 't', NULL
        |  FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL SELECT doc_id, 2, 11, 6, 7, '8388607', NULL, 'u', NULL
        |  FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL SELECT doc_id, 2, 11, 7, 8, '2147483647', NULL, 'v', NULL
        |  FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL SELECT doc_id, 2, 11, 8, 9, '140737488355327', NULL, 'w', NULL
        |  FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL SELECT doc_id, 2, 11, 9, 10, '9223372036854775807', NULL, 'z', NULL
        |  FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL SELECT doc_id, 2, 11, 10, 11, '-9223372036854775808', NULL, 'neg', NULL
        |  FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL SELECT doc_id, NULL, NULL, 0, NULL, NULL, NULL, NULL,
        |    NULL FROM documents WHERE doc_id % 2 = 1)
        |ORDER BY doc_id, pos""".stripMargin,

    "q289_sqlite_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 5 = 0 THEN NULL
        |    WHEN doc_id % 2 = 0 THEN 4096 ELSE 65536 END AS page_size,
        |  CAST(CASE WHEN doc_id % 5 = 0 THEN NULL
        |    ELSE doc_id % 50 + 1 END AS BIGINT) AS n_pages,
        |  CASE WHEN doc_id % 5 = 0 THEN NULL
        |    WHEN doc_id % 3 = 0 THEN 'utf8'
        |    WHEN doc_id % 3 = 1 THEN 'utf16le'
        |    ELSE 'utf16be' END AS encoding,
        |  CASE WHEN doc_id % 5 = 0 THEN NULL
        |    ELSE CAST(doc_id % 7 AS INT) END AS user_version,
        |  CASE WHEN doc_id % 5 = 0 THEN NULL
        |    ELSE 3045001 END AS sqlite_version
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q267: identical rows to q264 — the gzip wrap must be lossless
    "q267_targz_list" ->
      """SELECT doc_id, entry_idx, name, "offset", size, typeflag FROM (
        |  SELECT doc_id, CAST(0 AS BIGINT) AS entry_idx, 'src/' AS name,
        |    CAST(512 AS BIGINT) AS "offset", CAST(0 AS BIGINT) AS size,
        |    '5' AS typeflag FROM documents
        |  UNION ALL SELECT doc_id, 1, 'src/main.py', 1024,
        |    14 + strlen(CAST(doc_id AS VARCHAR)), '0' FROM documents
        |  UNION ALL SELECT doc_id, 2, 'README.md', 2048,
        |    least(strlen(text), 30), '0' FROM documents)
        |WHERE doc_id % 8 <> 0 ORDER BY doc_id, entry_idx""".stripMargin,

    // q265: the extracted member replayed from the same arithmetic
    "q265_tar_member" ->
      """SELECT doc_id, 'print(''doc ' || CAST(doc_id AS VARCHAR) ||
        |  ''')' || chr(10) AS text
        |FROM documents WHERE doc_id % 8 <> 0 ORDER BY doc_id""".stripMargin,

    // q263: three entries per surviving archive, derived from the
    // builder's arithmetic; runs concatenate, entities decode
    "q263_xlsx_strings" ->
      """SELECT doc_id, CAST(si_idx AS BIGINT) AS si_idx,
        |  CASE si_idx WHEN 0 THEN 'Plain ' || CAST(doc_id AS VARCHAR)
        |    WHEN 1 THEN 'Rich run' ELSE 'AT&T value' END AS text
        |FROM documents, (VALUES (0), (1), (2)) AS s(si_idx)
        |WHERE doc_id % 7 <> 0 ORDER BY doc_id, si_idx""".stripMargin,

    // q262: the joining contract replayed arithmetically — Tj + TJ
    // concat with the in-block space, stream join with newline
    "q262_pdf_text" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 13 = 0 THEN NULL
        |       WHEN doc_id % 2 = 0 THEN 'Hello doc ' ||
        |         CAST(doc_id AS VARCHAR) || ' AB' || chr(10) || 'Part two'
        |       ELSE 'Hello doc ' || CAST(doc_id AS VARCHAR) || ' AB' END
        |    AS pdf_text,
        |  CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
        |       WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END AS BIGINT)
        |    AS n_streams,
        |  CAST(CASE WHEN doc_id % 13 = 0 THEN NULL
        |       WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END AS BIGINT)
        |    AS n_decoded
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q261: three records per surviving archive, derived from the
    // same arithmetic as the builder; corrupted archives contribute
    // NO rows (whole-archive fail-closed)
    "q261_warc_gz_file" ->
      """WITH r(rec_idx) AS (VALUES (0), (1), (2))
        |SELECT doc_id, CAST(rec_idx AS BIGINT) AS rec_idx,
        |  'response' AS warc_type,
        |  'https://site' || CAST(doc_id % 7 AS VARCHAR) ||
        |    '.example.com/p' || CAST(doc_id AS VARCHAR) || 'r' ||
        |    CAST(rec_idx AS VARCHAR) AS target_uri,
        |  '2026-01-01T00:00:00Z' AS warc_date,
        |  CAST(n_chars AS BIGINT) AS content_length,
        |  200 AS http_status, 'text/html' AS content_type,
        |  '<html>' || substr(text, 1, 20) || 'r' ||
        |    CAST(rec_idx AS VARCHAR) || '</html>' AS body
        |FROM documents, r WHERE doc_id % 9 <> 0
        |ORDER BY doc_id, rec_idx""".stripMargin,

    // q256: the cleaned text derived from the same columns the XML
    // builder used — paragraph newlines, entity decoded; the
    // data-descriptor rows now resolve via their central directory
    // (round 12), so every row extracts
    "q256_docx_text" ->
      """SELECT doc_id,
        |  'Title ' || CAST(doc_id AS VARCHAR) || chr(10) ||
        |    substr(text, 1, 30) || ' & more' || chr(10) AS docx_text
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q221: each feed row derived arithmetically per domain parity
    "q221_feed_parse" ->
      """WITH r AS (SELECT DISTINCT CAST(doc_id % 7 AS INT) AS d FROM documents),
        |s AS (SELECT 'site' || CAST(d AS VARCHAR) || '.example.com' AS domain,
        |  CAST(d AS VARCHAR) AS ds, d FROM r)
        |SELECT domain, pos, kind, title, link, published FROM (
        |  SELECT domain, CAST(0 AS BIGINT) AS pos,
        |    CASE WHEN d % 2 = 0 THEN 'rss' ELSE 'atom' END AS kind,
        |    CASE WHEN d % 2 = 0 THEN 'Post one on site' || ds
        |         ELSE 'Entry one on site' || ds END AS title,
        |    CASE WHEN d % 2 = 0 THEN 'https://site' || ds || '.example.com/a1'
        |         ELSE 'https://site' || ds || '.example.com/e1' END AS link,
        |    CASE WHEN d % 2 = 0 THEN 'Mon, 01 Jan 2026'
        |         ELSE '2026-01-02' END AS published FROM s
        |  UNION ALL SELECT domain, CAST(1 AS BIGINT),
        |    CASE WHEN d % 2 = 0 THEN 'rss' ELSE 'atom' END,
        |    CASE WHEN d % 2 = 0 THEN 'Post two' ELSE 'Entry two' END,
        |    CASE WHEN d % 2 = 0 THEN 'https://site' || ds || '.example.com/a2'
        |         ELSE 'https://site' || ds || '.example.com/e2' END,
        |    NULL FROM s)
        |ORDER BY domain, pos""".stripMargin,

    // q222: og pairs derived arithmetically; the non-og meta never
    // appears
    "q222_og_tags" ->
      """SELECT doc_id, pos, og_property, og_content FROM (
        |  SELECT doc_id, CAST(0 AS BIGINT) AS pos, 'title' AS og_property,
        |    'Card ' || CAST(doc_id AS VARCHAR) AS og_content FROM documents
        |  UNION ALL SELECT doc_id, CAST(1 AS BIGINT), 'type', 'article'
        |    FROM documents
        |  UNION ALL SELECT doc_id, CAST(2 AS BIGINT), 'image',
        |    'https://img.example.com/i' || CAST(doc_id % 9 AS VARCHAR) || '.png'
        |    FROM documents WHERE doc_id % 3 = 0)
        |ORDER BY doc_id, pos""".stripMargin,

    // q223: the cleaned reply and its exact line-class counts
    "q223_strip_quoted" ->
      """SELECT doc_id,
        |  'Reply body line one for doc ' || CAST(doc_id AS VARCHAR) || '.' ||
        |    chr(10) || 'Second body line ' || CAST(doc_id % 7 AS VARCHAR) || '.'
        |    AS cleaned,
        |  CAST(8 AS BIGINT) AS n_lines, CAST(2 AS BIGINT) AS n_quoted,
        |  CAST(3 AS BIGINT) AS n_signature
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q220: every cell derived arithmetically; the second table only
    // on doc_id%4==0
    "q220_html_tables" ->
      """SELECT doc_id, table_idx, row_idx, col_idx, is_header, cell FROM (
        |  SELECT doc_id, CAST(0 AS BIGINT) AS table_idx,
        |    CAST(0 AS BIGINT) AS row_idx, CAST(0 AS BIGINT) AS col_idx,
        |    true AS is_header, 'Name' AS cell FROM documents
        |  UNION ALL SELECT doc_id, 0, 0, 1, true, 'Value' FROM documents
        |  UNION ALL SELECT doc_id, 0, 1, 0, false, 'alpha & co' FROM documents
        |  UNION ALL SELECT doc_id, 0, 1, 1, false,
        |    CAST(doc_id AS VARCHAR) FROM documents
        |  UNION ALL SELECT doc_id, 1, 0, 0, false,
        |    'solo ' || CAST(doc_id % 9 AS VARCHAR) FROM documents
        |    WHERE doc_id % 4 = 0)
        |ORDER BY doc_id, table_idx, row_idx, col_idx""".stripMargin,

    // q219: headers + padding drop out of the hash; audio bytes are
    // the raw text bytes
    "q219_flac_fingerprint" ->
      """SELECT doc_id AS media_id,
        |  CAST(46 + doc_id % 5 + strlen(text) AS BIGINT) AS n_bytes,
        |  'flac' AS format, md5(text) AS fingerprint
        |FROM documents ORDER BY media_id""".stripMargin,

    // q217: every parsed field derived arithmetically per record shape
    "q217_warc_parse" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'warcinfo' ELSE 'response' END
        |    AS warc_type,
        |  CASE WHEN doc_id % 3 = 0 THEN NULL
        |       ELSE 'https://site' || CAST(doc_id % 7 AS VARCHAR) ||
        |            '.example.com/p' || CAST(doc_id AS VARCHAR) END AS target_uri,
        |  '2026-01-01T00:00:00Z' AS warc_date,
        |  CAST(n_chars AS BIGINT) AS content_length,
        |  CASE WHEN doc_id % 3 = 0 THEN NULL
        |       WHEN doc_id % 2 = 0 THEN 200 ELSE 404 END AS http_status,
        |  CASE WHEN doc_id % 3 = 0 THEN NULL
        |       WHEN doc_id % 2 = 0 THEN 'text/html; charset=UTF-8'
        |       ELSE 'text/plain' END AS content_type,
        |  CASE WHEN doc_id % 3 = 0
        |       THEN 'software: graft-fixture ' || CAST(doc_id AS VARCHAR)
        |       ELSE '<html><body>' || substr(text, 1, 40) || '</body></html>'
        |  END AS body
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q218: both sitemap lines per domain, section position ignored
    "q218_robots_sitemaps" ->
      """WITH r AS (SELECT DISTINCT CAST(doc_id % 7 AS VARCHAR) AS d FROM documents)
        |SELECT 'site' || d || '.example.com' AS domain, pos, url AS sitemap_url
        |FROM (
        |  SELECT d, CAST(0 AS BIGINT) AS pos,
        |    'https://site' || d || '.example.com/sitemap.xml' AS url FROM r
        |  UNION ALL SELECT d, CAST(3 AS BIGINT),
        |    'https://cdn.maps.net/shared' || d || '.xml' FROM r)
        |ORDER BY domain, pos""".stripMargin,

    // q214: ASCII text means chars == bytes for the text part; every
    // stray 0xFF is one replacement event, the C3A9 suffix one char
    "q214_utf8_stats" ->
      """SELECT doc_id AS media_id,
        |  CAST(strlen(text) + doc_id % 4 +
        |    CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 0 END AS BIGINT) AS n_bytes,
        |  CAST(length(text) +
        |    CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_chars,
        |  CAST(doc_id % 4 AS BIGINT) AS n_invalid,
        |  doc_id % 4 = 0 AS is_valid_utf8
        |FROM documents ORDER BY media_id""".stripMargin,

    // q215: first wildcard-section crawl-delay per domain; d5 binds
    // its delay to gptbot (absent), d6 has none (absent)
    "q215_crawl_delay" ->
      """WITH r AS (SELECT DISTINCT CAST(doc_id % 7 AS INT) AS d FROM documents)
        |SELECT 'site' || CAST(d AS VARCHAR) || '.example.com' AS domain,
        |  CAST(d AS DOUBLE) + 0.5 AS crawl_delay
        |FROM r WHERE d <= 4 ORDER BY domain""".stripMargin,

    // q216: the composed frontier derived arithmetically per domain
    "q216_crawl_frontier" ->
      """WITH r AS (SELECT DISTINCT CAST(doc_id % 7 AS INT) AS di FROM documents),
        |s AS (SELECT 'site' || CAST(di AS VARCHAR) || '.example.com' AS domain,
        |  di FROM r)
        |SELECT domain, pos, loc, allowed, crawl_delay FROM (
        |  SELECT domain, CAST(0 AS BIGINT) AS pos,
        |    'https://' || domain || '/p1' AS loc, true AS allowed,
        |    CASE WHEN di % 2 = 0 THEN CAST(1.5 AS DOUBLE) END AS crawl_delay
        |  FROM s
        |  UNION ALL SELECT domain, CAST(1 AS BIGINT),
        |    'https://' || domain || '/private/p2', di % 2 <> 0,
        |    CASE WHEN di % 2 = 0 THEN CAST(1.5 AS DOUBLE) END FROM s)
        |ORDER BY domain, pos""".stripMargin,

    // q211: cue rows derived arithmetically (block 0 = WEBVTT header,
    // 1 = NOTE, cues at 2 and 3)
    "q211_vtt_parse" ->
      """WITH d AS (SELECT doc_id, doc_id % 60 AS ss, doc_id % 10 AS mm
        |  FROM documents)
        |SELECT doc_id, block_pos, start_ms, end_ms,
        |  end_ms - start_ms AS duration_ms, text FROM (
        |  SELECT doc_id, CAST(2 AS BIGINT) AS block_pos,
        |    CAST(ss * 1000 AS BIGINT) AS start_ms,
        |    CAST(ss * 1000 + 900 AS BIGINT) AS end_ms,
        |    'First cue for doc ' || CAST(doc_id AS VARCHAR) || '.' AS text
        |  FROM d
        |  UNION ALL SELECT doc_id, CAST(3 AS BIGINT),
        |    CAST(mm * 60000 + 10500 AS BIGINT),
        |    CAST(mm * 60000 + 12750 AS BIGINT),
        |    'Second cue line one.' || chr(10) || 'Line two.' FROM d)
        |ORDER BY doc_id, block_pos""".stripMargin,

    // q212: each turn derived arithmetically; the narrative line at
    // pos 1 never appears
    "q212_dialogue_turns" ->
      """SELECT doc_id, turn_pos, speaker, utterance, n_words FROM (
        |  SELECT doc_id, CAST(0 AS BIGINT) AS turn_pos, 'Host' AS speaker,
        |    'Welcome to episode ' || CAST(doc_id AS VARCHAR) || '.' AS utterance,
        |    CAST(4 AS BIGINT) AS n_words FROM documents
        |  UNION ALL SELECT doc_id, CAST(2 AS BIGINT), 'Dr. Gray',
        |    'Thanks for having me.', CAST(4 AS BIGINT) FROM documents
        |  UNION ALL SELECT doc_id, CAST(3 AS BIGINT), 'Host',
        |    'Question ' || CAST(doc_id % 7 AS VARCHAR) || ' coming up.',
        |    CAST(4 AS BIGINT) FROM documents)
        |ORDER BY doc_id, turn_pos""".stripMargin,

    // q213: the fence-parity trick replayed (1-based even segments =
    // the engine's 0-based odd = code)
    "q213_markdown_stats" ->
      """WITH d AS (SELECT doc_id,
        |    '# Title' || chr(10) || chr(10) ||
        |    'Some intro with a [link](https://x.io/' ||
        |    CAST(doc_id AS VARCHAR) || ').' || chr(10) || chr(10) ||
        |    '## Section' || chr(10) || chr(10) || '```' || chr(10) ||
        |    substr(text, 1, 30) || chr(10) || '```' || chr(10) || chr(10) ||
        |    'tail ' ||
        |    CASE WHEN doc_id % 3 = 0 THEN '```unterminated code'
        |         ELSE 'plain end' END AS md
        |  FROM documents),
        |p AS (SELECT doc_id, md, string_split(md, '```') AS parts FROM d),
        |c AS (SELECT doc_id, sum(length(seg)) AS s FROM
        |  (SELECT doc_id, i, parts[i] AS seg FROM
        |    (SELECT doc_id, parts, unnest(generate_series(1, len(parts))) AS i
        |     FROM p)
        |   WHERE i % 2 = 0) GROUP BY 1)
        |SELECT p.doc_id,
        |  CAST(len(list_filter(string_split(md, chr(10)),
        |    l -> regexp_matches(l, '^#{1,6} '))) AS BIGINT) AS n_headers,
        |  CAST(len(parts) // 2 AS BIGINT) AS n_code_blocks,
        |  CAST(len(regexp_extract_all(md,
        |    '\[[^\]]*\]\([^)]*\)')) AS BIGINT) AS n_links,
        |  CAST(coalesce(c.s, 0) AS BIGINT) AS code_chars,
        |  CAST(length(md) AS BIGINT) AS n_chars,
        |  CASE WHEN length(md) > 0
        |    THEN CAST(coalesce(c.s, 0) AS DOUBLE) / length(md)
        |  END AS code_fraction
        |FROM p LEFT JOIN c USING (doc_id)
        |ORDER BY p.doc_id""".stripMargin,

    // q210: two HITS rounds unrolled as CTE pairs (auth from hubs,
    // hubs from the FRESH auths) — exact integer path counts
    "q210_hits_scores" -> {
      val rounds = (1 to 2).map { r =>
        val p = s"s${r - 1}"
        s"""a$r AS (SELECT w.dst AS id, CAST(sum(w.w * $p.hub) AS BIGINT) AS a
           |  FROM w JOIN $p ON $p.id = w.src GROUP BY 1),
           |sa$r AS (SELECT $p.id, $p.hub, coalesce(a$r.a, 0) AS auth
           |  FROM $p LEFT JOIN a$r USING (id)),
           |h$r AS (SELECT w.src AS id, CAST(sum(w.w * sa$r.auth) AS BIGINT) AS h
           |  FROM w JOIN sa$r ON sa$r.id = w.dst GROUP BY 1),
           |s$r AS (SELECT sa$r.id, coalesce(h$r.h, 0) AS hub, sa$r.auth
           |  FROM sa$r LEFT JOIN h$r USING (id))""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT 'site' || CAST(doc_id % 7 AS VARCHAR) AS src,
         |         'ext' || CAST(doc_id % 5 AS VARCHAR) AS dst FROM documents
         |  UNION ALL
         |  SELECT 'site' || CAST(doc_id % 7 AS VARCHAR), 'cdn' FROM documents),
         |w AS (SELECT src, dst, count(*) AS w FROM e GROUP BY 1, 2),
         |n AS (SELECT DISTINCT src AS id FROM w
         |      UNION SELECT DISTINCT dst FROM w),
         |s0 AS (SELECT id, CAST(1 AS BIGINT) AS hub,
         |       CAST(1 AS BIGINT) AS auth FROM n),
         |$rounds
         |SELECT id, hub, auth FROM s2 ORDER BY id""".stripMargin
    },

    // q208: the flac builder formulas inverted arithmetically
    "q208_flac_meta" ->
      """SELECT doc_id AS media_id, CAST(42 AS BIGINT) AS n_bytes,
        |  CAST(n_chars % 4096 + 16 AS INT) AS min_block,
        |  CAST(n_chars % 4096 + 16 AS INT) AS max_block,
        |  CAST(n_chars % 48000 + 8000 AS INT) AS sample_rate,
        |  CAST(doc_id % 8 + 1 AS INT) AS channels,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 16 ELSE 24 END AS INT)
        |    AS bits_per_sample,
        |  CAST(n_chars * 1000 AS BIGINT) AS total_samples
        |FROM documents ORDER BY media_id""".stripMargin,

    // q209: MPEG1 Layer III tables replayed as a list index + CASEs
    "q209_mp3_meta" ->
      """SELECT doc_id AS media_id,
        |  CAST(([32,40,48,56,64,80,96,112,128,160,192,224,256,320])
        |    [CAST(doc_id % 14 + 1 AS INT)] AS INT) AS bitrate_kbps,
        |  CAST(CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 44100
        |    WHEN 1 THEN 48000 ELSE 32000 END AS INT) AS sample_rate,
        |  CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'stereo'
        |    WHEN 1 THEN 'joint' WHEN 2 THEN 'dual' ELSE 'mono'
        |  END AS channel_mode,
        |  doc_id % 2 = 0 AS has_id3
        |FROM documents ORDER BY media_id""".stripMargin,

    // q206: heif builder formulas; n_bytes = 20 ftyp + (64 + k) meta
    "q206_heif_meta" ->
      """SELECT doc_id AS media_id,
        |  CAST(84 + doc_id % 5 AS BIGINT) AS n_bytes,
        |  CASE WHEN doc_id % 2 = 0 THEN 'avif' ELSE 'heic' END AS brand,
        |  CAST(n_chars % 640 + 1 AS INT) AS width,
        |  CAST(n_chars % 480 + 1 AS INT) AS height
        |FROM documents ORDER BY media_id""".stripMargin,

    // q207: header bytes (ftyp 16 + free 8+k) drop out of the hash;
    // only the mdat payload — the raw text bytes — is fingerprinted
    "q207_mp4_fingerprint" ->
      """SELECT doc_id AS media_id,
        |  CAST(32 + doc_id % 5 + strlen(text) AS BIGINT) AS n_bytes,
        |  'mp4' AS format, md5(text) AS fingerprint
        |FROM documents ORDER BY media_id""".stripMargin,

    // q199: the mp4 builder formulas the box walk must invert; total
    // size = 16 ftyp + (8 + doc_id%5) free + 216/240 moov (v0/v1)
    "q199_mp4_meta" ->
      """SELECT doc_id AS media_id,
        |  CAST(CASE WHEN doc_id % 2 = 1 THEN 264 ELSE 240 END
        |       + doc_id % 5 AS BIGINT) AS n_bytes,
        |  'isom' AS brand,
        |  CAST(n_chars % 9000 + 1000 AS BIGINT) AS timescale,
        |  CAST(n_chars * 100 + doc_id % 100 AS BIGINT) AS duration,
        |  CAST(n_chars % 640 + 1 AS INT) AS width,
        |  CAST(n_chars % 480 + 1 AS INT) AS height
        |FROM documents ORDER BY media_id""".stripMargin,

    // q194: the span schedule replayed in DuckDB — same md5-nibble
    // start offsets, same block arithmetic, same sentinel strings;
    // s(b) is written out inline wherever it appears
    "q194_span_corrupt" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tl
        |  FROM documents),
        |d AS (SELECT doc_id, tl, len(tl) AS n,
        |        CAST(ceil(len(tl) / 10.0) AS BIGINT) AS nb
        |      FROM t WHERE len(tl) > 0),
        |inp AS (
        |  SELECT doc_id,
        |    array_to_string(list_filter(list_transform(generate_series(1, n), i ->
        |      CASE
        |        WHEN (i-1) % 10 = (strpos('0123456789abcdef',
        |            substr(md5(CAST(doc_id AS VARCHAR) || '|' ||
        |              CAST((i-1)//10 AS VARCHAR)), 1, 1)) - 1) % 8
        |          THEN '<extra_id_' || CAST((i-1)//10 AS VARCHAR) || '>'
        |        WHEN (i-1) % 10 = (strpos('0123456789abcdef',
        |            substr(md5(CAST(doc_id AS VARCHAR) || '|' ||
        |              CAST((i-1)//10 AS VARCHAR)), 1, 1)) - 1) % 8 + 1
        |          THEN NULL
        |        ELSE tl[i] END), x -> x IS NOT NULL), ' ') AS input
        |  FROM d),
        |sp AS (
        |  SELECT doc_id, n, tl,
        |    list_transform(generate_series(0, nb-1), b ->
        |      b*10 + (strpos('0123456789abcdef',
        |        substr(md5(CAST(doc_id AS VARCHAR) || '|' ||
        |          CAST(b AS VARCHAR)), 1, 1)) - 1) % 8) AS p0s
        |  FROM d),
        |agg AS (
        |  SELECT doc_id, n,
        |    CAST(len(list_filter(p0s, p -> p < n)) AS BIGINT) AS n_spans,
        |    CAST(coalesce(list_sum(list_transform(p0s, p ->
        |      CASE WHEN p < n THEN least(2, n - p) ELSE 0 END)), 0) AS BIGINT)
        |      AS n_masked,
        |    list_filter(list_transform(generate_series(0, len(p0s)-1), b ->
        |      CASE WHEN p0s[b+1] < n THEN
        |        '<extra_id_' || CAST(b AS VARCHAR) || '> ' ||
        |        array_to_string(list_slice(tl, p0s[b+1]+1,
        |          least(p0s[b+1]+2, n)), ' ')
        |      ELSE NULL END), x -> x IS NOT NULL) AS pieces
        |  FROM sp)
        |SELECT a.doc_id, CAST(a.n AS BIGINT) AS n_tokens, a.n_spans,
        |  a.n_masked, i.input,
        |  array_to_string(list_concat(a.pieces,
        |    ['<extra_id_' || CAST(a.n_spans AS VARCHAR) || '>']), ' ') AS target
        |FROM agg a JOIN inp i USING (doc_id) ORDER BY a.doc_id""".stripMargin,

    // q193: q184's canonicalization chain, then the keep-newest pick
    // as a window (ts DESC, length DESC, id ASC) — equivalent to the
    // engine's map-side max_by struct ordering — plus group counts
    "q193_url_dedup" ->
      """WITH u AS (SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://Recrawl'
        |         ELSE 'https://recrawl' END ||
        |    CAST(doc_id % 50 AS VARCHAR) || '.example.com/page' ||
        |    CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END ||
        |    CASE WHEN doc_id % 4 = 0 THEN '?utm_source=x' ELSE '' END ||
        |    '#frag' AS url,
        |    doc_id % 100 AS ts,
        |    CASE WHEN doc_id % 5 = 0 THEN 'Unchanged cached snapshot body.'
        |         ELSE text END AS text
        |  FROM documents),
        |n AS (SELECT doc_id, ts, text, regexp_replace(url, '#[^#]*$', '') AS nf FROM u),
        |p AS (SELECT doc_id, ts, text,
        |  lower(regexp_extract(nf, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
        |  regexp_replace(lower(regexp_extract(nf,
        |    '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)), ':(80|443)$', '') AS hostnp,
        |  regexp_extract(nf, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$', 1) AS rest
        |  FROM n),
        |q AS (SELECT doc_id, ts, text, scheme, hostnp,
        |  regexp_extract(rest, '^([^?]*)', 1) AS path,
        |  regexp_extract(rest, '[?](.*)$', 1) AS query FROM p),
        |c AS (SELECT doc_id, ts, text,
        |  scheme || '://' || hostnp ||
        |  CASE WHEN regexp_matches(path, '^.+/$')
        |       THEN regexp_replace(path, '/$', '') ELSE path END ||
        |  CASE WHEN coalesce(array_to_string(list_filter(string_split(query, '&'),
        |         x -> NOT regexp_matches(x, '^utm_')), '&'), '') = '' THEN ''
        |       ELSE '?' || array_to_string(list_filter(string_split(query, '&'),
        |         x -> NOT regexp_matches(x, '^utm_')), '&') END AS url
        |  FROM q),
        |w AS (SELECT url, doc_id, ts, text,
        |    row_number() OVER (PARTITION BY url
        |      ORDER BY ts DESC, strlen(text) DESC, doc_id ASC) AS rn
        |  FROM c),
        |g AS (SELECT url, count(*) AS n_snapshots,
        |    count(DISTINCT md5(text)) AS n_distinct_texts
        |  FROM c GROUP BY 1)
        |SELECT w.url, w.doc_id, w.ts, w.text, g.n_snapshots, g.n_distinct_texts
        |FROM w JOIN g USING (url) WHERE rn = 1 ORDER BY url""".stripMargin,

    // q190: same census in RE2 script classes (\p{Han} etc. — RE2's
    // spelling of Java's \p{IsHan}); counts are exact ints, dominant
    // is the same first-in-order argmax CASE chain
    "q190_script_census" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    substr(text, 1, 30) || ' ' || repeat(
        |      CASE CAST(doc_id % 5 AS INT)
        |        WHEN 0 THEN '漢字漢字漢字漢字漢字漢字'
        |        WHEN 1 THEN 'Русский текст про язык'
        |        WHEN 2 THEN 'النص العربي للاختبار'
        |        WHEN 3 THEN 'ทดสอบภาษาไทยสั้น'
        |        ELSE 'ελληνικό κείμενο εδώ' END, 3) AS text
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    CAST(length(text) - length(regexp_replace(text, '\p{Latin}', '', 'g')) AS BIGINT) AS n_latin,
        |    CAST(length(text) - length(regexp_replace(text, '\p{Han}', '', 'g')) AS BIGINT) AS n_han,
        |    CAST(length(text) - length(regexp_replace(text, '\p{Cyrillic}', '', 'g')) AS BIGINT) AS n_cyrillic,
        |    CAST(length(text) - length(regexp_replace(text, '\p{Arabic}', '', 'g')) AS BIGINT) AS n_arabic,
        |    CAST(length(text) - length(regexp_replace(text, '\p{Hangul}', '', 'g')) AS BIGINT) AS n_hangul,
        |    CAST(length(text) - length(regexp_replace(text, '[\p{Hiragana}\p{Katakana}]', '', 'g')) AS BIGINT) AS n_kana,
        |    CAST(length(text) - length(regexp_replace(text, '\p{Thai}', '', 'g')) AS BIGINT) AS n_thai,
        |    CAST(length(text) - length(regexp_replace(text, '\p{Greek}', '', 'g')) AS BIGINT) AS n_greek
        |  FROM d)
        |SELECT doc_id, n_latin, n_han, n_cyrillic, n_arabic, n_hangul,
        |  n_kana, n_thai, n_greek,
        |  CASE
        |    WHEN n_latin = greatest(n_latin, n_han, n_cyrillic, n_arabic,
        |      n_hangul, n_kana, n_thai, n_greek) AND n_latin > 0 THEN 'latin'
        |    WHEN n_han = greatest(n_latin, n_han, n_cyrillic, n_arabic,
        |      n_hangul, n_kana, n_thai, n_greek) AND n_han > 0 THEN 'han'
        |    WHEN n_cyrillic = greatest(n_latin, n_han, n_cyrillic, n_arabic,
        |      n_hangul, n_kana, n_thai, n_greek) AND n_cyrillic > 0 THEN 'cyrillic'
        |    WHEN n_arabic = greatest(n_latin, n_han, n_cyrillic, n_arabic,
        |      n_hangul, n_kana, n_thai, n_greek) AND n_arabic > 0 THEN 'arabic'
        |    WHEN n_hangul = greatest(n_latin, n_han, n_cyrillic, n_arabic,
        |      n_hangul, n_kana, n_thai, n_greek) AND n_hangul > 0 THEN 'hangul'
        |    WHEN n_kana = greatest(n_latin, n_han, n_cyrillic, n_arabic,
        |      n_hangul, n_kana, n_thai, n_greek) AND n_kana > 0 THEN 'kana'
        |    WHEN n_thai = greatest(n_latin, n_han, n_cyrillic, n_arabic,
        |      n_hangul, n_kana, n_thai, n_greek) AND n_thai > 0 THEN 'thai'
        |    WHEN n_greek = greatest(n_latin, n_han, n_cyrillic, n_arabic,
        |      n_hangul, n_kana, n_thai, n_greek) AND n_greek > 0 THEN 'greek'
        |    ELSE 'none' END AS dominant
        |FROM c ORDER BY doc_id""".stripMargin,
    // hashed-bag linear scorer: same nibble bucket hash, same literal
    // weight list; 1/64-grid weights make the SUM order-free exact
    "q103_linear_score" -> {
      val w = linearScoreWeights.mkString("[", ", ", "]")
      val hx = "md5(tok)"
      def nib(i: Int) = s"(strpos('0123456789abcdef', substr($hx, $i, 1)) - 1)"
      s"""WITH $tokCte,
         |h AS (SELECT doc_id,
         |  (${nib(1)} * 4096 + ${nib(2)} * 256 + ${nib(3)} * 16 + ${nib(4)}) % 64 AS bkt
         |  FROM toks)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  SUM(list_extract($w, bkt + 1)) / count(*) + 0.5 AS score
         |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    "q92_curation_pipeline" -> curationPipelineOracle,
    "q93_exact_sample" -> exactSampleOracle,
    "q108_weighted_sample" -> weightedSampleOracle,
    "q95_heavy_hitters" ->
      s"""WITH $tokCte,
         |tot AS (SELECT count(*) AS n FROM toks)
         |SELECT tok AS token, CAST(count(*) AS BIGINT) AS cnt
         |FROM toks CROSS JOIN tot
         |GROUP BY tok, n
         |HAVING count(*) * 40 > n
         |ORDER BY token""".stripMargin,

    "q107_count_min" ->
      s"""WITH $tokCte
         |SELECT tok AS token, CAST(count(*) AS BIGINT) AS exact_cnt,
         |  TRUE AS ge_exact, TRUE AS within_band
         |FROM toks GROUP BY tok
         |ORDER BY exact_cnt DESC, token LIMIT 30""".stripMargin,

    "q98_token_budget" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
        |      AS n_tokens,
        |    md5(source || '|' || CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents)
        |SELECT source, doc_id, n_tokens,
        |  CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id)
        |    AS BIGINT) AS cum_tokens
        |FROM t
        |QUALIFY cum_tokens <= 600
        |ORDER BY source, doc_id""".stripMargin,

    "q100_remove_boilerplate" ->
      """WITH e AS (
        |  SELECT doc_id, text || '. Extra tail one! Question two? End.' AS text
        |  FROM documents),
        |l AS (
        |  SELECT doc_id, list_filter(
        |    list_transform(regexp_extract_all(text, '[^.!?]+[.!?]*'), s -> trim(s)),
        |    s -> s <> '') AS ls
        |  FROM e),
        |u AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(ls)),
        |    i -> {'sid': i - 1, 's': ls[i]})) AS x
        |  FROM l),
        |sent AS (SELECT doc_id, CAST(x.sid AS BIGINT) AS sid, x.s AS s FROM u),
        |freq AS (
        |  SELECT s FROM (SELECT DISTINCT s, doc_id FROM sent)
        |  GROUP BY s HAVING count(*) >= 3),
        |kept AS (
        |  SELECT doc_id, sid, s FROM sent
        |  WHERE s NOT IN (SELECT s FROM freq))
        |SELECT doc_id, string_agg(s, ' ' ORDER BY sid) AS clean_text,
        |  CAST(count(*) AS BIGINT) AS n_kept
        |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // within-doc sentence dedup: first occurrence wins, original order
    // kept; n_total counts pre-dedup sentences
    "q104_dedup_sentences" ->
      """WITH e AS (
        |  SELECT doc_id, text || '. Dup one! Dup one! Unique tail.' AS text
        |  FROM documents),
        |l AS (
        |  SELECT doc_id, list_filter(
        |    list_transform(regexp_extract_all(text, '[^.!?]+[.!?]*'), s -> trim(s)),
        |    s -> s <> '') AS ls
        |  FROM e),
        |u AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(ls)),
        |    i -> {'sid': i - 1, 's': ls[i]})) AS x
        |  FROM l),
        |f AS (
        |  SELECT doc_id, x.sid AS sid, x.s AS s,
        |    row_number() OVER (PARTITION BY doc_id, x.s ORDER BY x.sid) AS rn
        |  FROM u)
        |SELECT doc_id,
        |  string_agg(s, ' ' ORDER BY sid) FILTER (WHERE rn = 1) AS clean_text,
        |  CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
        |  CAST(count(*) AS BIGINT) AS n_total
        |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q110_truncate_tokens" ->
      """WITH l AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tl
        |  FROM documents)
        |SELECT doc_id, array_to_string(tl[1:50], ' ') AS clean_text,
        |  CAST(least(len(tl), 50) AS BIGINT) AS n_kept,
        |  CAST(greatest(len(tl) - 50, 0) AS BIGINT) AS n_dropped
        |FROM l ORDER BY doc_id""".stripMargin,

    // window count 1 + max(0, ceil((n-W)/S)) via the identical
    // floor((n-W+S-1)/S) arithmetic; DuckDB list slices are 1-based
    // inclusive and truncate at the end like Spark's slice
    "q111_sentence_windows" ->
      """WITH e AS (
        |  SELECT doc_id, text || '. Extra tail one! Question two? End.' AS text
        |  FROM documents),
        |l AS (
        |  SELECT doc_id, list_filter(
        |    list_transform(regexp_extract_all(text, '[^.!?]+[.!?]*'), s -> trim(s)),
        |    s -> s <> '') AS ls
        |  FROM e),
        |n AS (
        |  SELECT doc_id, ls,
        |    1 + greatest(0, CAST(floor(CAST(len(ls) - 2 + 1 - 1 AS DOUBLE) / 1)
        |      AS INTEGER)) AS nw
        |  FROM l WHERE len(ls) > 0)
        |SELECT doc_id, CAST(x.cid AS BIGINT) AS chunk_id, x.txt AS chunk_text
        |FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(0, nw - 1),
        |    i -> {'cid': i, 'txt': array_to_string(ls[i * 1 + 1 : i * 1 + 2], ' ')})) AS x
        |  FROM n)
        |ORDER BY doc_id, chunk_id""".stripMargin,

    // same CDC chain as q83; a chunk occurrence is removed when its
    // ≥8-token hash spans ≥2 distinct docs and it is not the
    // (doc_id, first_pos)-minimal canonical occurrence; docs rebuild
    // from surviving token positions
    "q112_remove_repeated_spans" ->
      """WITH d AS (
        |  SELECT doc_id, tl AS toks, len(tl) AS n
        |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tl
        |        FROM documents)
        |  WHERE len(tl) > 0),
        |e0 AS (SELECT doc_id, toks, n,
        |  [i FOR i IN range(3, n + 1)
        |     IF substr(md5(array_to_string(toks[i-2:i], ' ')), 1, 1) = '0'] AS ends0
        |  FROM d),
        |e1 AS (SELECT doc_id, toks,
        |  CASE WHEN len(ends0) > 0 AND ends0[-1] = n THEN ends0
        |       ELSE list_append(ends0, n) END AS ends
        |  FROM e0),
        |e2 AS (SELECT doc_id, toks, ends,
        |  list_prepend(1, [e + 1 FOR e IN ends[1:len(ends)-1]]) AS starts
        |  FROM e1),
        |c AS (SELECT doc_id, toks,
        |  unnest([{'ci': j - 1, 's': starts[j], 'e': ends[j]}
        |          FOR j IN range(1, len(ends) + 1)]) AS ch
        |  FROM e2),
        |occ AS (SELECT doc_id, ch.s AS first_pos, ch.e - ch.s + 1 AS n_tokens,
        |    md5(array_to_string(toks[ch.s:ch.e], ' ')) AS chunk_hash
        |  FROM c WHERE ch.e - ch.s + 1 >= 8),
        |rep AS (SELECT chunk_hash FROM occ
        |  GROUP BY chunk_hash HAVING count(DISTINCT doc_id) >= 2),
        |ranked AS (SELECT o.doc_id, o.first_pos, o.n_tokens,
        |    row_number() OVER (PARTITION BY o.chunk_hash
        |                       ORDER BY o.doc_id, o.first_pos) AS rn
        |  FROM occ o JOIN rep USING (chunk_hash)),
        |rmspans AS (SELECT doc_id,
        |    list({'f': first_pos, 'n': n_tokens}) AS rm
        |  FROM ranked WHERE rn > 1 GROUP BY doc_id),
        |base AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS tl
        |  FROM documents)
        |SELECT b.doc_id,
        |  CASE WHEN r.rm IS NULL THEN array_to_string(b.tl, ' ')
        |       ELSE array_to_string([b.tl[i] FOR i IN range(1, len(b.tl) + 1)
        |         IF len(list_filter(r.rm, s -> i >= s.f AND i < s.f + s.n)) = 0], ' ')
        |  END AS clean_text,
        |  CAST(COALESCE(list_sum([s.n FOR s IN r.rm]), 0) AS BIGINT) AS n_removed
        |FROM base b LEFT JOIN rmspans r USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q113_bpe_train" -> bpeTrainOracle(8),
    // q333: the byte-level chain replayed with the arithmetic
    // byte-map CTE (byteBpeCtes)
    "q333_byte_bpe_train" -> byteBpeTrainOracle(8),
    // q334: the MM chain replayed (bradleyTerryOracle)
    "q334_bradley_terry" -> bradleyTerryOracle(10),
    "q114_bpe_encode" -> bpeEncodeOracle(8, 50),
    "q141_tokenizer_fertility" -> tokenizerFertilityOracle(8),
    "q142_shuffle_shards" -> shuffleShardsOracle(8),
    "q144_epoch_schedule" -> epochScheduleOracle(
      Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2), 5000L),
    "q146_unigram_vocab" -> unigramVocabOracle,
    // q149: same 2^24 integer-grid sums; the product mirrors Spark's
    // expression order so the doubles are bit-identical
    "q149_covariance" ->
      """WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |x AS (SELECT v[p] * v[q] AS xy, v[p] AS xp, v[q] AS xq, p, q
        |      FROM e, unnest(generate_series(1, len(v))) AS t1(p),
        |           unnest(generate_series(p, len(v))) AS t2(q)),
        |g AS (SELECT p - 1 AS p, q - 1 AS q, count(*) AS n,
        |        CAST(SUM(CAST(FLOOR(xy * 16777216.0) AS BIGINT)) AS BIGINT) AS sxy,
        |        CAST(SUM(CAST(FLOOR(xp * 16777216.0) AS BIGINT)) AS BIGINT) AS sxp,
        |        CAST(SUM(CAST(FLOOR(xq * 16777216.0) AS BIGINT)) AS BIGINT) AS sxq
        |      FROM x GROUP BY 1, 2)
        |SELECT CAST(p AS BIGINT) AS p, CAST(q AS BIGINT) AS q,
        |  CAST(sxy AS DOUBLE) / n / 16777216.0
        |    - (CAST(sxp AS DOUBLE) / n / 16777216.0)
        |      * (CAST(sxq AS DOUBLE) / n / 16777216.0) AS cov
        |FROM g ORDER BY p, q""".stripMargin,
    "q147_unigram_segment" -> unigramSegmentOracle(50),
    "q148_unigram_reestimate" -> unigramReestimateOracle,
    "q150_langid_trained" -> langIdTrainedOracle,
    "q163_langid_margin" -> langIdMarginOracle(50),

    // the q147 Viterbi unroll + dense ids by piece-ASC rank
    "q164_unigram_encode" ->
      s"""WITH ${unigramVocabCtes(4, 20)},
         |${unigramSegCtes(4, 16)},
         |ids AS (SELECT piece, row_number() OVER (ORDER BY piece) AS piece_id FROM v),
         |tok AS (SELECT doc_id, x.pos AS pos, x.word AS word FROM (
         |  SELECT doc_id, unnest([{'pos': i, 'word': tl[i]}
         |                         FOR i IN range(1, len(tl) + 1)]) AS x
         |  FROM (SELECT doc_id,
         |          list_filter(string_split(text, ' '), t -> t <> '') AS tl
         |        FROM documents WHERE doc_id < 50)))
         |SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         |  CAST(piece_idx AS BIGINT) AS piece_idx,
         |  CAST(piece_id AS BIGINT) AS piece_id, piece
         |FROM tok JOIN seg USING (word) JOIN ids USING (piece)
         |ORDER BY doc_id, pos, piece_idx""".stripMargin,

    "q178_robust_standardize" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |x AS (SELECT vec_id, i - 1 AS dim, v[i] AS x
        |      FROM e, unnest(generate_series(1, len(v))) AS t(i)),
        |r AS (SELECT dim, x AS q, row_number() OVER (PARTITION BY dim ORDER BY x) AS rn,
        |        count(*) OVER (PARTITION BY dim) AS n FROM x),
        |med AS (SELECT dim, q AS med FROM r WHERE rn = CAST(ceil(0.5 * n) AS BIGINT)),
        |q1 AS (SELECT dim, q AS q1 FROM r WHERE rn = CAST(ceil(0.25 * n) AS BIGINT)),
        |q3 AS (SELECT dim, q AS q3 FROM r WHERE rn = CAST(ceil(0.75 * n) AS BIGINT))
        |SELECT x.vec_id, CAST(x.dim AS BIGINT) AS dim, x.x AS x,
        |  CASE WHEN q3.q3 = q1.q1 THEN 0.0
        |       ELSE (x.x - med.med) / (q3.q3 - q1.q1) END AS x_robust
        |FROM x JOIN med USING (dim) JOIN q1 USING (dim) JOIN q3 USING (dim)
        |ORDER BY vec_id, dim""".stripMargin,

    // exact per-dim order statistics at k = ceil(p*n), clip in place
    "q165_winsorize" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |x AS (SELECT vec_id, i - 1 AS dim, v[i] AS x
        |      FROM e, unnest(generate_series(1, len(v))) AS t(i)),
        |r AS (SELECT dim, x AS q, row_number() OVER (PARTITION BY dim ORDER BY x) AS rn,
        |        count(*) OVER (PARTITION BY dim) AS n FROM x),
        |lo AS (SELECT dim, q AS lo FROM r WHERE rn = CAST(ceil(0.05 * n) AS BIGINT)),
        |hi AS (SELECT dim, q AS hi FROM r WHERE rn = CAST(ceil(0.95 * n) AS BIGINT))
        |SELECT x.vec_id, CAST(x.dim AS BIGINT) AS dim, x.x AS x,
        |  CASE WHEN x.x < lo.lo THEN lo.lo
        |       WHEN x.x > hi.hi THEN hi.hi ELSE x.x END AS x_clipped
        |FROM x JOIN lo USING (dim) JOIN hi USING (dim)
        |ORDER BY vec_id, dim""".stripMargin,

    "q167_vocab_growth" ->
      """WITH w AS (
        |  SELECT source, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS word
        |  FROM documents),
        |c AS (SELECT source, word, count(*) AS c FROM w GROUP BY 1, 2)
        |SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |  count(*) AS n_types,
        |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        |  CAST(count(*) AS DOUBLE) / SUM(c) AS type_token,
        |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS hapax_ratio
        |FROM c GROUP BY source ORDER BY source""".stripMargin,

    "q168_count_of_counts" ->
      """WITH b AS (
        |  SELECT unnest(list_transform(
        |      generate_series(1, len(tl) - 1),
        |      i -> tl[i] || ' ' || tl[i + 1])) AS ng
        |  FROM (SELECT list_filter(string_split(text, ' '), t -> t <> '') AS tl
        |        FROM documents)),
        |pc AS (SELECT ng, count(*) AS c FROM b GROUP BY 1)
        |SELECT c, count(*) AS n_c FROM pc GROUP BY c ORDER BY c""".stripMargin,

    "q169_pagerank" -> pagerankOracle(5),
    "q170_shard_manifest" -> shardManifestOracle(8),

    "q177_card_scan" ->
      """WITH p AS (
        |  SELECT doc_id, text,
        |    '4' || lpad(CAST((doc_id * 31 + 7) % 100000000000000 AS VARCHAR), 14, '0') AS pre
        |  FROM documents),
        |pd AS (SELECT doc_id, i, CAST(substr(pre, i, 1) AS INT) AS d
        |       FROM p, unnest(generate_series(1, 15)) AS t(i)),
        |s15 AS (SELECT doc_id,
        |    SUM(CASE WHEN (16 - i) % 2 = 1
        |        THEN CASE WHEN 2 * d > 9 THEN 2 * d - 9 ELSE 2 * d END
        |        ELSE d END) AS s
        |  FROM pd GROUP BY 1),
        |f AS (SELECT p.doc_id,
        |    p.text || ' ' || p.pre || CAST((10 - s % 10) % 10 AS VARCHAR)
        |      || ' ' || p.pre || CAST(((10 - s % 10) % 10 + 1) % 10 AS VARCHAR) AS text2
        |  FROM p JOIN s15 USING (doc_id)),
        |cands AS (SELECT doc_id,
        |    unnest(regexp_extract_all(text2, '\b\d{13,19}\b')) AS candidate
        |  FROM f),
        |cd AS (SELECT doc_id, candidate, i, CAST(substr(candidate, i, 1) AS INT) AS d
        |       FROM cands, unnest(generate_series(1, len(candidate))) AS t(i))
        |SELECT doc_id, candidate,
        |  SUM(CASE WHEN (len(candidate) - i) % 2 = 1
        |      THEN CASE WHEN 2 * d > 9 THEN 2 * d - 9 ELSE 2 * d END
        |      ELSE d END) % 10 = 0 AS luhn_valid
        |FROM cd GROUP BY doc_id, candidate ORDER BY doc_id, candidate""".stripMargin,

    // trigram KN mirrored expression-by-expression (left-associative
    // double assembly, ln rounded once, DECIMAL doc sums)
    "q176_kn_trigram" ->
      """WITH tgs AS (
        |  SELECT doc_id, tl[i] AS w1, tl[i + 1] AS w2, tl[i + 2] AS w3
        |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tl
        |        FROM documents),
        |    unnest(generate_series(1, len(tl) - 2)) AS t(i)),
        |t AS (SELECT w1, w2, w3, count(*) AS c123 FROM tgs GROUP BY 1, 2, 3),
        |top AS (
        |  SELECT *, CAST(SUM(c123) OVER (PARTITION BY w1, w2) AS BIGINT) AS c12,
        |    COUNT(*) OVER (PARTITION BY w1, w2) AS n1p12
        |  FROM t),
        |m AS (SELECT w2, w3, count(*) AS nMid FROM t GROUP BY 1, 2),
        |mm AS (
        |  SELECT *, CAST(SUM(nMid) OVER (PARTITION BY w2) AS BIGINT) AS nMidDen,
        |    COUNT(*) OVER (PARTITION BY w2) AS n1pw2,
        |    COUNT(*) OVER (PARTITION BY w3) AS n1pw3
        |  FROM m),
        |npp AS (SELECT count(*) AS npp FROM m),
        |pbi AS (
        |  SELECT w2, w3,
        |    greatest(nMid - 0.75, 0) / nMidDen
        |      + 0.75 * n1pw2 / nMidDen * (CAST(n1pw3 AS DOUBLE) / npp) AS pbi
        |  FROM mm, npp),
        |model AS (
        |  SELECT top.w1, top.w2, top.w3,
        |    CAST(round(ln(greatest(c123 - 0.75, 0) / c12
        |      + 0.75 * n1p12 / c12 * pbi), 9) AS DECIMAL(28,9)) AS lp
        |  FROM top JOIN pbi USING (w2, w3)),
        |s AS (SELECT doc_id, count(*) AS n_trigrams, SUM(lp) AS sm
        |      FROM tgs JOIN model USING (w1, w2, w3) GROUP BY 1)
        |SELECT doc_id, n_trigrams, CAST(sm AS DOUBLE) AS sum_logprob,
        |  CAST(sm AS DOUBLE) / n_trigrams AS avg_logprob
        |FROM s ORDER BY doc_id""".stripMargin,

    // the WAV builder formulas recomputed arithmetically: duration =
    // dataLen·1000 // byteRate, signed-PCM16 |amplitude| stats over
    // the 256-sample prefix
    "q173_wav_stats" ->
      """WITH p AS (
        |  SELECT doc_id, (doc_id % 32 + 64) AS n,
        |    (doc_id % 3 * 8000 + 16000) AS sr
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, ((doc_id * 31 + i * 17) % 65536) AS v
        |  FROM p, unnest(generate_series(0, least(256, n) - 1)) AS t(i)),
        |a AS (SELECT doc_id,
        |        CASE WHEN v >= 32768 THEN 65536 - v ELSE v END AS av FROM s)
        |SELECT p.doc_id AS media_id,
        |  CAST((p.n * 2 * 1000) // (p.sr * 2) AS BIGINT) AS duration_ms,
        |  CAST(least(256, p.n) AS BIGINT) AS n_prefix,
        |  CAST(max(a.av) AS BIGINT) AS peak_abs,
        |  CAST(SUM(a.av) AS BIGINT) AS sum_abs
        |FROM p JOIN a USING (doc_id)
        |GROUP BY p.doc_id, p.n, p.sr ORDER BY media_id""".stripMargin,

    "q174_bmp_dhash" -> bmpDhashOracle,
    "q175_image_neardup" -> imageNearDupOracle,
    // q179: the oracle cannot inflate zlib, but the planted pixels
    // follow q174's formula and PNG/BMP dHash share one definition —
    // so the SAME formula terms predict the decoded hash; the Spark
    // side proves signature walk + stored-block inflate + all five
    // filter inversions recover exactly those pixels
    "q179_png_dhash" ->
      s"""SELECT doc_id AS media_id, CAST(16 AS INT) AS width,
         |  CAST(16 AS INT) AS height,
         |  (${bmpDhashTerms("doc_id % 25")}) AS dhash
         |FROM documents ORDER BY media_id""".stripMargin,

    // q180: the per-codepoint no-space-script fallback expressed with
    // RE2 script classes — each matched codepoint spaced out, then the
    // usual split; space-script tokens unchanged
    "q180_cjk_vocab" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    substr(text, 1, 30) || ' ' ||
        |    l[(doc_id * 1) % 12 + 1] || l[(doc_id * 5) % 12 + 1] ||
        |    l[(doc_id * 7) % 12 + 1] || ' ' ||
        |    'mix' || l[(doc_id * 3) % 12 + 1] || 'ed' AS text
        |  FROM (SELECT doc_id, text,
        |          ['漢','字','図','本','の','が','ア','ト','한','국','ไ','ท'] AS l
        |        FROM documents)),
        |tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(
        |    regexp_replace(text,
        |      '([\p{Han}\p{Hiragana}\p{Katakana}\p{Hangul}\p{Thai}])',
        |      ' \1 ', 'g'), ' '), t -> t <> '')) AS token
        |  FROM base)
        |SELECT token, count(*) AS n_occurrences,
        |  count(DISTINCT doc_id) AS n_docs
        |FROM tok GROUP BY token ORDER BY token""".stripMargin,

    // q183: the identical RE2 chain replayed (DuckDB regexp_replace
    // needs the explicit 'g' flag Spark applies by default); the
    // single-pass entity decode replays as split + per-entity CASE +
    // ordered string_agg stitch, with chr() standing in for the
    // engine's UTF-16BE decode (same string for every BMP codepoint)
    "q183_html_extract" -> {
      val ent = "&(lt|gt|quot|nbsp|amp);|&#[0-9]{1,7};|&#[xX][0-9a-fA-F]{1,6};"
      def code(re: String) = s"CAST(${re} AS BIGINT)"
      val decC = code("regexp_extract(e, '^&#([0-9]+);$', 1)")
      val hexC = code("'0x' || regexp_extract(e, '^&#[xX]([0-9a-fA-F]+);$', 1)")
      def bmp(c: String) =
        s"CASE WHEN $c BETWEEN 1 AND 65535 AND NOT $c BETWEEN 55296 AND 57343 " +
          s"THEN chr(CAST($c AS INT)) ELSE e END"
      s"""WITH h AS (SELECT doc_id,
        |  '<html><head><title>T</title><style>body{color:red}</style>' ||
        |  '</head><body><h1 class="hd">' || substr(text, 1, 20) ||
        |  '</h1><p>' || substr(text, 21, 40) ||
        |  ' &amp; more &lt;tags&gt;&nbsp;end</p>' ||
        |  '<p>it&#8217;s &#x27;q&#X6F; n&#160;b &#38;lt; &#999999; &#xD800;</p>' ||
        |  '<SCRIPT>' || chr(10) || 'var x = "<p>";' || chr(10) ||
        |  '</SCRIPT></body></html>' AS html
        |  FROM documents),
        |s1 AS (SELECT doc_id, regexp_replace(html,
        |  '(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>', ' ', 'g') AS t
        |  FROM h),
        |s2 AS (SELECT doc_id, regexp_replace(t, '<[^>]*>', ' ', 'g') AS t FROM s1),
        |p AS (SELECT doc_id, t, string_split_regex(t, '$ent') AS parts,
        |  regexp_extract_all(t, '$ent') AS ents FROM s2),
        |x AS (SELECT doc_id, i, ents[i] AS e, parts[i + 1] AS tail
        |  FROM (SELECT doc_id, parts, ents,
        |    unnest(generate_series(1, len(ents))) AS i FROM p)),
        |y AS (SELECT doc_id, i, tail,
        |  CASE WHEN e = '&lt;' THEN '<' WHEN e = '&gt;' THEN '>'
        |       WHEN e = '&quot;' THEN '"' WHEN e = '&nbsp;' THEN ' '
        |       WHEN e = '&amp;' THEN '&'
        |       WHEN regexp_matches(e, '^&#[0-9]') THEN ${bmp(decC)}
        |       ELSE ${bmp(hexC)} END AS d
        |  FROM x),
        |z AS (SELECT doc_id, string_agg(d || tail, '' ORDER BY i) AS rest
        |  FROM y GROUP BY doc_id)
        |SELECT p.doc_id, trim(regexp_replace(
        |  CASE WHEN len(p.ents) = 0 THEN p.t
        |       ELSE p.parts[1] || coalesce(z.rest, '') END,
        |  ' +', ' ', 'g')) AS clean
        |FROM p LEFT JOIN z ON p.doc_id = z.doc_id
        |ORDER BY p.doc_id""".stripMargin
    },

    // q184: the same parse/normalize chain in DuckDB string functions
    "q184_url_normalize" ->
      """WITH u AS (SELECT doc_id,
        |  'HTTPS://WWW.Site' || CAST(doc_id % 7 AS VARCHAR) || '.Example.COM' ||
        |  CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END ||
        |  '/Path/' || CAST(doc_id AS VARCHAR) ||
        |  CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END ||
        |  '?utm_source=feed&ref=abc&utm_campaign=x#section-2' AS url
        |  FROM documents),
        |n AS (SELECT doc_id, url, regexp_replace(url, '#[^#]*$', '') AS nf FROM u),
        |p AS (SELECT doc_id, url,
        |  lower(regexp_extract(nf, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
        |  lower(regexp_extract(nf, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)) AS host,
        |  regexp_extract(nf, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(.*)$', 1) AS rest
        |  FROM n),
        |q AS (SELECT doc_id, url, scheme,
        |  regexp_replace(host, ':(80|443)$', '') AS hostnp,
        |  regexp_extract(rest, '^([^?]*)', 1) AS path,
        |  regexp_extract(rest, '[?](.*)$', 1) AS query
        |  FROM p),
        |r AS (SELECT doc_id, url AS orig, scheme, hostnp,
        |  CASE WHEN regexp_matches(path, '^.+/$')
        |       THEN regexp_replace(path, '/$', '') ELSE path END AS npath,
        |  array_to_string(list_filter(string_split(query, '&'),
        |    x -> NOT regexp_matches(x, '^utm_')), '&') AS kq
        |  FROM q)
        |SELECT doc_id,
        |  scheme || '://' || hostnp || npath ||
        |    CASE WHEN kq = '' THEN '' ELSE '?' || kq END AS url,
        |  lower(regexp_extract(orig, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)', 1))
        |    AS domain
        |FROM r ORDER BY doc_id""".stripMargin,

    // q182: the q58-style CONTRACT row — same-bytes JPEG copies share
    // a decode, so same-pattern docs pair at hamming 0; patterns sit
    // >=12 bits apart (verified at design time), so no other pair can
    // enter the hamming-3 radius. Hash values deliberately unhashed.
    "q182_jpeg_neardup" ->
      """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(0 AS BIGINT) AS hamming
        |FROM documents a JOIN documents b
        |  ON a.doc_id < b.doc_id AND a.doc_id % 25 = b.doc_id % 25
        |ORDER BY doc_a, doc_b""".stripMargin,

    // q181: sign-of-delta bits predicted from the base waveform —
    // gain cancels in the comparison (g>0), exactly the invariance
    // the fingerprint claims; exact all-pairs hamming like q175
    "q181_audio_neardup" ->
      s"""WITH hset AS (
         |  SELECT doc_id, (${wavFingerprintTerms("doc_id % 25")}) AS fp
         |  FROM documents)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
         |FROM hset a JOIN hset b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.fp, b.fp)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,

    "q171_compressibility" ->
      """WITH bg AS (
        |  SELECT doc_id, substr(text, i, 2) AS bg
        |  FROM documents, unnest(generate_series(1, len(text) - 1)) AS t(i)
        |  WHERE len(text) >= 2),
        |c AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2),
        |n AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY 1)
        |SELECT c.doc_id, n.n AS n_bigrams,
        |  CAST(CAST(SUM(CAST(c.c AS DECIMAL(10,0))
        |    * CAST(round(ln(CAST(n.n AS DOUBLE) / c.c), 9) AS DECIMAL(18,9)))
        |    AS DECIMAL(28,9)) AS DOUBLE) AS score
        |FROM c JOIN n USING (doc_id)
        |GROUP BY c.doc_id, n.n ORDER BY doc_id""".stripMargin,

    "q172_cluster_sources" ->
      s"""WITH RECURSIVE $lshPairsCtes,
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs),
         |reach AS (
         |  SELECT src AS id, dst AS r FROM edges
         |  UNION
         |  SELECT re.id, e.dst FROM reach re JOIN edges e ON re.r = e.src),
         |comp AS (SELECT id, least(id, min(r)) AS comp FROM reach GROUP BY id),
         |m AS (SELECT comp.comp, d.source FROM comp
         |      JOIN documents d ON d.doc_id = comp.id),
         |cs AS (SELECT comp, source, count(*) AS n FROM m GROUP BY 1, 2)
         |SELECT comp, CAST(SUM(n) AS BIGINT) AS n_docs, count(*) AS n_sources
         |FROM cs GROUP BY comp ORDER BY comp""".stripMargin,

    // q70's bigram model rolled up per source; exact decimal sums
    "q166_source_lm_fit" ->
      """WITH b AS (
        |  SELECT source, unnest(list_transform(
        |      generate_series(1, len(tl) - 1),
        |      i -> {'t1': tl[i], 't2': tl[i + 1]})) AS bg
        |  FROM (SELECT source, list_filter(string_split(text, ' '), t -> t <> '') AS tl
        |        FROM documents)),
        |bg AS (SELECT source, bg.t1 AS t1, bg.t2 AS t2 FROM b),
        |pc AS (SELECT t1, t2, count(*) AS c_pair FROM bg GROUP BY 1, 2),
        |pfx AS (SELECT t1, SUM(c_pair) AS c_prefix FROM pc GROUP BY 1),
        |m AS (SELECT t1, t2,
        |        CAST(round(ln(CAST(c_pair AS DOUBLE) / c_prefix), 9)
        |          AS DECIMAL(28,9)) AS lp
        |      FROM pc JOIN pfx USING (t1)),
        |s AS (SELECT source, count(*) AS n_bigrams, SUM(lp) AS sm
        |      FROM bg JOIN m USING (t1, t2) GROUP BY 1)
        |SELECT source, n_bigrams, CAST(sm AS DOUBLE) AS sum_logprob,
        |  CAST(sm AS DOUBLE) / n_bigrams AS avg_logprob
        |FROM s ORDER BY source""".stripMargin,

    // q185: the q166 chain extended with the exact integer-weight
    // budget split (best-fit max is a 1-row cross; weights and
    // budgets all integer arithmetic)
    "q185_doremi_budgets" ->
      """WITH b AS (
        |  SELECT source, unnest(list_transform(
        |      generate_series(1, len(tl) - 1),
        |      i -> {'t1': tl[i], 't2': tl[i + 1]})) AS bg
        |  FROM (SELECT source, list_filter(string_split(text, ' '), t -> t <> '') AS tl
        |        FROM documents)),
        |bg AS (SELECT source, bg.t1 AS t1, bg.t2 AS t2 FROM b),
        |pc AS (SELECT t1, t2, count(*) AS c_pair FROM bg GROUP BY 1, 2),
        |pfx AS (SELECT t1, SUM(c_pair) AS c_prefix FROM pc GROUP BY 1),
        |m AS (SELECT t1, t2,
        |        CAST(round(ln(CAST(c_pair AS DOUBLE) / c_prefix), 9)
        |          AS DECIMAL(28,9)) AS lp
        |      FROM pc JOIN pfx USING (t1)),
        |s AS (SELECT source, count(*) AS n_bigrams,
        |        CAST(SUM(lp) AS DOUBLE) / count(*) AS avg_logprob
        |      FROM bg JOIN m USING (t1, t2) GROUP BY 1),
        |w AS (SELECT source, n_bigrams, avg_logprob,
        |        CAST(CAST(round((SELECT max(avg_logprob) FROM s) - avg_logprob, 6)
        |          AS DECIMAL(18,6)) * 1000000 AS BIGINT) + 1 AS excess_weight
        |      FROM s)
        |SELECT source, n_bigrams, avg_logprob, excess_weight,
        |  CAST((1000000 * excess_weight) //
        |    (SELECT SUM(excess_weight) FROM w) AS BIGINT) AS budget_tokens
        |FROM w ORDER BY source""".stripMargin,

    // q186/q187: the WordPiece merge chain (likelihood-scored) and its
    // greedy longest-match encode, both unrolled as chained CTEs
    "q186_wordpiece_train" -> wpTrainOracle(8),
    "q187_wordpiece_encode" -> wpEncodeOracle(8, 50, 8),

    // q188: the repair must invert the planted corruption exactly, so
    // the oracle never corrupts at all — it predicts rounds from the
    // planted schedule and the repaired text as the clean original
    "q188_fix_mojibake" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    substr(text, 1, 40) || ' café — “q” € ' ||
        |    CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'ü' WHEN 1 THEN 'ñ'
        |         WHEN 2 THEN 'ā' ELSE 'ž' END AS clean
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS INT) AS rounds,
        |  clean AS repaired
        |FROM c ORDER BY doc_id""".stripMargin,
    // q151: kth order statistic per dim — the q105 window pattern
    "q151_dim_median" ->
      """WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |x AS (SELECT i - 1 AS dim, v[i] AS x
        |      FROM e, unnest(generate_series(1, len(v))) AS t(i)),
        |r AS (SELECT dim, x, row_number() OVER (PARTITION BY dim ORDER BY x) AS rn,
        |        count(*) OVER (PARTITION BY dim) AS n FROM x)
        |SELECT CAST(dim AS BIGINT) AS dim, n,
        |  CAST(ceil(0.5 * n) AS BIGINT) AS k, x AS quantile
        |FROM r WHERE rn = CAST(ceil(0.5 * n) AS BIGINT)
        |ORDER BY dim""".stripMargin,
    // q153: per-user RFM, six exact tercile order statistics (q105
    // window pattern, explicit DOUBLE thirds mirroring Spark's lit),
    // CASE buckets tie low
    "q153_rfm_segments" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day, value FROM events),
        |anchor AS (SELECT max(day) AS anchor FROM e),
        |pu AS MATERIALIZED (
        |  SELECT user_id,
        |    CAST((SELECT anchor FROM anchor) - max(day) AS BIGINT) AS recency,
        |    count(*) AS frequency,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS monetary
        |  FROM e GROUP BY user_id),
        |cr AS (SELECT CAST(recency AS DOUBLE) AS v,
        |         row_number() OVER (ORDER BY recency) AS rn,
        |         count(*) OVER () AS n FROM pu),
        |r1 AS (SELECT v FROM cr WHERE rn = CAST(ceil(CAST(1 AS DOUBLE) / 3 * n) AS BIGINT)),
        |r2 AS (SELECT v FROM cr WHERE rn = CAST(ceil(CAST(2 AS DOUBLE) / 3 * n) AS BIGINT)),
        |cf AS (SELECT CAST(frequency AS DOUBLE) AS v,
        |         row_number() OVER (ORDER BY frequency) AS rn,
        |         count(*) OVER () AS n FROM pu),
        |f1 AS (SELECT v FROM cf WHERE rn = CAST(ceil(CAST(1 AS DOUBLE) / 3 * n) AS BIGINT)),
        |f2 AS (SELECT v FROM cf WHERE rn = CAST(ceil(CAST(2 AS DOUBLE) / 3 * n) AS BIGINT)),
        |cm AS (SELECT monetary AS v,
        |         row_number() OVER (ORDER BY monetary) AS rn,
        |         count(*) OVER () AS n FROM pu),
        |m1 AS (SELECT v FROM cm WHERE rn = CAST(ceil(CAST(1 AS DOUBLE) / 3 * n) AS BIGINT)),
        |m2 AS (SELECT v FROM cm WHERE rn = CAST(ceil(CAST(2 AS DOUBLE) / 3 * n) AS BIGINT)),
        |b AS (SELECT
        |    CAST(CASE WHEN CAST(recency AS DOUBLE) <= (SELECT v FROM r1) THEN 0
        |              WHEN CAST(recency AS DOUBLE) <= (SELECT v FROM r2) THEN 1
        |              ELSE 2 END AS BIGINT) AS r_bucket,
        |    CAST(CASE WHEN CAST(frequency AS DOUBLE) <= (SELECT v FROM f1) THEN 0
        |              WHEN CAST(frequency AS DOUBLE) <= (SELECT v FROM f2) THEN 1
        |              ELSE 2 END AS BIGINT) AS f_bucket,
        |    CAST(CASE WHEN monetary <= (SELECT v FROM m1) THEN 0
        |              WHEN monetary <= (SELECT v FROM m2) THEN 1
        |              ELSE 2 END AS BIGINT) AS m_bucket
        |  FROM pu)
        |SELECT r_bucket, f_bucket, m_bucket, count(*) AS n_users
        |FROM b GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // q159: source × observed-bucket grid, Laplace-smoothed KL with
    // the contributions rounded once and DECIMAL-summed
    "q159_source_divergence" -> {
      def nib(i: Int) = s"(strpos('0123456789abcdef', substr(md5(tok), $i, 1)) - 1)"
      val bkt = s"(${nib(1)} * 4096 + ${nib(2)} * 256 + ${nib(3)} * 16 + ${nib(4)}) % 256"
      s"""WITH sb AS (
         |  SELECT source, $bkt AS bucket, count(*) AS n
         |  FROM (SELECT source,
         |          unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
         |        FROM documents)
         |  GROUP BY 1, 2),
         |ch AS (SELECT bucket, CAST(SUM(n) AS BIGINT) AS nc FROM sb GROUP BY 1),
         |st AS (SELECT source, CAST(SUM(n) AS BIGINT) AS tot_s FROM sb GROUP BY 1),
         |bc AS (SELECT count(*) AS B, CAST(SUM(nc) AS BIGINT) AS tot_c FROM ch),
         |grid AS (
         |  SELECT st.source, st.tot_s, coalesce(sb.n, 0) AS n,
         |    ch.nc, bc.B, bc.tot_c
         |  FROM st CROSS JOIN ch CROSS JOIN bc
         |  LEFT JOIN sb ON sb.source = st.source AND sb.bucket = ch.bucket),
         |c AS (SELECT source, tot_s,
         |    CAST(round(
         |      (CAST(n + 1 AS DOUBLE) / (tot_s + B))
         |        * round(ln((CAST(n + 1 AS DOUBLE) / (tot_s + B))
         |                   / (CAST(nc + 1 AS DOUBLE) / (tot_c + B))), 9),
         |      9) AS DECIMAL(18,9)) AS c
         |  FROM grid)
         |SELECT source, min(tot_s) AS n_tokens,
         |  CAST(SUM(c) AS DOUBLE) AS kl
         |FROM c GROUP BY source ORDER BY source""".stripMargin
    },

    "q160_scrub_unicode" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(nfc_normalize(text)),
        |    '[^\p{L}\p{Nd} ]', ' ', 'g'), ' +', ' ', 'g')) AS clean
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q162_secret_scan" ->
      """WITH tok AS (
        |  SELECT doc_id, x.pos AS pos, x.word AS token FROM (
        |    SELECT doc_id, unnest([{'pos': i, 'word': tl[i]}
        |                           FOR i IN range(1, len(tl) + 1)]) AS x
        |    FROM (SELECT doc_id,
        |            list_filter(string_split(text, ' '), t -> t <> '') AS tl
        |          FROM documents))
        |  WHERE len(x.word) >= 8),
        |ch AS (
        |  SELECT doc_id, pos, token, substr(token, i, 1) AS c
        |  FROM tok, unnest(generate_series(1, len(token))) AS t(i)),
        |cnt AS (
        |  SELECT doc_id, pos, token, c, count(*) AS k
        |  FROM ch GROUP BY 1, 2, 3, 4),
        |sc AS (
        |  SELECT doc_id, pos, token,
        |    CAST(SUM(CAST(k AS DECIMAL(10,0))
        |      * CAST(round(ln(CAST(len(token) AS DOUBLE) / k), 9)
        |             AS DECIMAL(18,9))) AS DECIMAL(28,9)) AS score
        |  FROM cnt GROUP BY 1, 2, 3)
        |SELECT doc_id, CAST(pos AS BIGINT) AS pos, token,
        |  CAST(len(token) AS BIGINT) AS n, CAST(score AS DOUBLE) AS score,
        |  score > CAST(CAST(2.0 AS DECIMAL(18,9)) * len(token) AS DECIMAL(28,9))
        |    AS high_entropy,
        |  regexp_matches(token, '^[0-9a-fA-F]{8,}$') AS looks_hex,
        |  regexp_matches(token, '^[A-Za-z0-9+/=]{8,}$') AS looks_b64
        |FROM sc ORDER BY doc_id, pos""".stripMargin,

    // the synthesized PNG is sig(8) + IHDR(25) + tEXt(12+|source|) +
    // IDAT(12+|text|) + IEND(12); only the IDAT stream is hashed
    "q161_payload_fingerprint" ->
      """SELECT doc_id AS media_id,
        |  CAST(69 + length(source) + length(text) AS BIGINT) AS n_bytes,
        |  'png' AS format, md5(text) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q154: q126's PSI formula over md5-hash16 token buckets
    "q154_token_drift" -> {
      def nib(i: Int) = s"(strpos('0123456789abcdef', substr(md5(tok), $i, 1)) - 1)"
      val bkt = s"(${nib(1)} * 4096 + ${nib(2)} * 256 + ${nib(3)} * 16 + ${nib(4)}) % 256"
      s"""WITH tb AS (
         |  SELECT $bkt AS bucket, count(*) AS n_base
         |  FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
         |        FROM documents WHERE source NOT LIKE 'src1%')
         |  GROUP BY 1),
         |tc AS (
         |  SELECT $bkt AS bucket, count(*) AS n_cur
         |  FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
         |        FROM documents WHERE source LIKE 'src1%')
         |  GROUP BY 1),
         |h AS (SELECT coalesce(tb.bucket, tc.bucket) AS bucket,
         |        coalesce(n_base, 0) AS n_base, coalesce(n_cur, 0) AS n_cur
         |      FROM tb FULL JOIN tc ON tb.bucket = tc.bucket),
         |tot AS (SELECT SUM(n_base) AS tb, SUM(n_cur) AS tc, count(*) AS nb FROM h)
         |SELECT CAST(bucket AS BIGINT) AS bucket,
         |  CAST(n_base AS BIGINT) AS n_base, CAST(n_cur AS BIGINT) AS n_cur,
         |  round((CAST(n_base + 1 AS DOUBLE) / (tb + nb)
         |         - CAST(n_cur + 1 AS DOUBLE) / (tc + nb))
         |    * round(ln((CAST(n_base + 1 AS DOUBLE) / (tb + nb))
         |               / (CAST(n_cur + 1 AS DOUBLE) / (tc + nb))), 9), 9)
         |    AS contrib
         |FROM h CROSS JOIN tot ORDER BY bucket""".stripMargin
    },

    // q152: distinct (user, day) activity, min-day cohorts, offsets
    "q152_retention" ->
      """WITH e AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |f AS (SELECT user_id, min(day) AS cohort FROM e GROUP BY 1)
        |SELECT cohort, CAST(e.day - f.cohort AS BIGINT) AS day_offset,
        |  count(*) AS n_users
        |FROM e JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort, day_offset""".stripMargin,
    "q115_logreg_train" -> logregTrainOracle(64, 3, 0.5),
    "q117_dsir_sample" -> dsirSampleOracle(25, 256),

    // k-th smallest = value at sorted position ceil(p*n) in the
    // multiset; with duplicates the VALUE at position k is unique even
    // though row_number's tie-break among equals is not
    "q105_exact_quantile" ->
      """WITH r AS (
        |  SELECT o_orderpriority, CAST(o_totalprice AS DOUBLE) AS v,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders)
        |SELECT o_orderpriority, n, CAST(ceil(0.9 * n) AS BIGINT) AS k,
        |  v AS quantile
        |FROM r WHERE rn = CAST(ceil(0.9 * n) AS BIGINT)
        |ORDER BY o_orderpriority""".stripMargin,

    // q70's bigram-LM scoring CTE + per-source exact 0.25-quantile
    // cutoff, keep strictly above — value-thresholded so cutoff ties
    // drop as a block (matches perplexityTailFilter's semantics)
    "q106_perplexity_filter" ->
      """WITH b AS (
        |  SELECT doc_id, unnest(list_transform(
        |      generate_series(1, len(tl) - 1),
        |      i -> {'t1': tl[i], 't2': tl[i + 1]})) AS bg
        |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tl
        |        FROM documents)),
        |bg AS (SELECT doc_id, bg.t1 AS t1, bg.t2 AS t2 FROM b),
        |pc AS (SELECT t1, t2, count(*) AS c_pair FROM bg GROUP BY 1, 2),
        |pfx AS (SELECT t1, SUM(c_pair) AS c_prefix FROM pc GROUP BY 1),
        |m AS (SELECT t1, t2,
        |        CAST(round(ln(CAST(c_pair AS DOUBLE) / c_prefix), 9)
        |          AS DECIMAL(28,9)) AS lp
        |      FROM pc JOIN pfx USING (t1)),
        |s AS (SELECT doc_id, count(*) AS n_bigrams, SUM(lp) AS sm
        |      FROM bg JOIN m USING (t1, t2) GROUP BY 1),
        |sc AS (SELECT d.source, s.doc_id, s.n_bigrams,
        |         CAST(s.sm AS DOUBLE) / s.n_bigrams AS avg_logprob
        |       FROM s JOIN documents d USING (doc_id)),
        |r AS (SELECT source, avg_logprob,
        |        row_number() OVER (PARTITION BY source ORDER BY avg_logprob) AS rn,
        |        count(*) OVER (PARTITION BY source) AS n
        |      FROM sc),
        |c AS (SELECT source, avg_logprob AS cut
        |      FROM r WHERE rn = CAST(ceil(0.25 * n) AS BIGINT))
        |SELECT sc.source, sc.doc_id, sc.n_bigrams, sc.avg_logprob
        |FROM sc JOIN c USING (source)
        |WHERE sc.avg_logprob > c.cut
        |ORDER BY sc.source, sc.doc_id""".stripMargin,

    // q191: q106's scoring chain with TWO per-source cuts (exact 1/3
    // and 2/3 order statistics) and value-threshold bucket labels
    "q191_perplexity_buckets" ->
      """WITH b AS (
        |  SELECT doc_id, unnest(list_transform(
        |      generate_series(1, len(tl) - 1),
        |      i -> {'t1': tl[i], 't2': tl[i + 1]})) AS bg
        |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tl
        |        FROM documents)),
        |bg AS (SELECT doc_id, bg.t1 AS t1, bg.t2 AS t2 FROM b),
        |pc AS (SELECT t1, t2, count(*) AS c_pair FROM bg GROUP BY 1, 2),
        |pfx AS (SELECT t1, SUM(c_pair) AS c_prefix FROM pc GROUP BY 1),
        |m AS (SELECT t1, t2,
        |        CAST(round(ln(CAST(c_pair AS DOUBLE) / c_prefix), 9)
        |          AS DECIMAL(28,9)) AS lp
        |      FROM pc JOIN pfx USING (t1)),
        |s AS (SELECT doc_id, count(*) AS n_bigrams, SUM(lp) AS sm
        |      FROM bg JOIN m USING (t1, t2) GROUP BY 1),
        |sc AS (SELECT d.source, s.doc_id, s.n_bigrams,
        |         CAST(s.sm AS DOUBLE) / s.n_bigrams AS avg_logprob
        |       FROM s JOIN documents d USING (doc_id)),
        |r AS (SELECT source, avg_logprob,
        |        row_number() OVER (PARTITION BY source ORDER BY avg_logprob) AS rn,
        |        count(*) OVER (PARTITION BY source) AS n
        |      FROM sc),
        |lo AS (SELECT source, avg_logprob AS lo_cut
        |       FROM r WHERE rn = CAST(ceil((1.0 / 3) * n) AS BIGINT)),
        |hi AS (SELECT source, avg_logprob AS hi_cut
        |       FROM r WHERE rn = CAST(ceil((2.0 / 3) * n) AS BIGINT))
        |SELECT sc.source, sc.doc_id, sc.n_bigrams, sc.avg_logprob,
        |  CASE WHEN sc.avg_logprob <= lo.lo_cut THEN 'tail'
        |       WHEN sc.avg_logprob <= hi.hi_cut THEN 'middle'
        |       ELSE 'head' END AS bucket
        |FROM sc JOIN lo USING (source) JOIN hi USING (source)
        |ORDER BY sc.source, sc.doc_id""".stripMargin,

    "q99_sentences" ->
      """WITH e AS (
        |  SELECT doc_id, text || '. Extra tail one! Question two? End.' AS text
        |  FROM documents),
        |l AS (
        |  SELECT doc_id, list_filter(
        |    list_transform(regexp_extract_all(text, '[^.!?]+[.!?]*'), s -> trim(s)),
        |    s -> s <> '') AS ls
        |  FROM e),
        |u AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(ls)),
        |    i -> {'sid': i - 1, 's': ls[i]})) AS x
        |  FROM l)
        |SELECT doc_id, CAST(x.sid AS BIGINT) AS sent_id, x.s AS sentence
        |FROM u ORDER BY doc_id, sent_id""".stripMargin,

    // window-count z-score from exact integer moments — the doubles
    // are pure IEEE arithmetic on exact longs, engine-portable
    "q73_window_zscore" ->
      """WITH c AS (
        |  SELECT time_bucket(INTERVAL '10 minutes', ts) AS win_start,
        |    event_type, count(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, count(*) AS n, SUM(n_events) AS s,
        |    SUM(n_events * n_events) AS q
        |  FROM c GROUP BY 1)
        |SELECT win_start, event_type, n_events,
        |  CASE WHEN CAST(q AS DOUBLE) / n
        |         - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n) > 0
        |    THEN (CAST(n_events AS DOUBLE) - CAST(s AS DOUBLE) / n)
        |      / sqrt(CAST(q AS DOUBLE) / n
        |             - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
        |    ELSE 0.0 END AS zscore
        |FROM c JOIN m USING (event_type)
        |ORDER BY event_type, win_start""".stripMargin,

    "q59_topk_per_key" ->
      """WITH r AS (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders)
        |SELECT o_orderpriority, CAST(rnk AS BIGINT) AS rnk,
        |  CAST(o_orderkey AS BIGINT) AS o_orderkey, o_totalprice
        |FROM r WHERE rnk <= 3 ORDER BY o_orderpriority, rnk""".stripMargin,

    "q47_percentiles" ->
      """SELECT o_orderpriority,
        |  quantile_cont(o_totalprice, 0.5) AS median,
        |  quantile_cont(o_totalprice, 0.9) AS p90,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q77_approx_percentiles" ->
      """SELECT o_orderpriority,
        |  quantile_cont(o_totalprice, 0.5) AS median,
        |  quantile_cont(o_totalprice, 0.9) AS p90,
        |  count(*) AS n,
        |  TRUE AS median_close, TRUE AS p90_close
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q30_neardup_cosine" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings WHERE vec_id % 4 = 0)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b, list_dot_product(a.v, b.v) AS sim
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |ORDER BY sim DESC, id_a, id_b LIMIT 20""".stripMargin,

    "q31_events_tumbling" ->
      """SELECT time_bucket(INTERVAL '10 minutes', ts) AS win_start, event_type,
        |  count(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q36_events_sliding" ->
      """WITH b AS (
        |  SELECT event_type, time_bucket(INTERVAL '5 minutes', ts) AS tb FROM events),
        |w AS (
        |  SELECT event_type, unnest([tb, tb - INTERVAL '5 minutes']) AS win_start FROM b)
        |SELECT win_start, event_type, count(*) AS n_events
        |FROM w GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin,

    "q37_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q45_asof_join" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, date_trunc('microseconds', ts) AS ts
        |  FROM events WHERE event_type IN ('error', 'signup')),
        |u AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END AS side
        |  FROM e),
        |m AS (
        |  SELECT *, coalesce(last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts, side, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1) AS right_id
        |  FROM u)
        |SELECT user_id, event_id AS left_id, right_id FROM m WHERE side = 1
        |ORDER BY user_id, left_id""".stripMargin,

    "q44_interval_join" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, date_trunc('microseconds', ts) AS ts
        |  FROM events)
        |SELECT a.user_id, a.event_id AS left_id, b.event_id AS right_id
        |FROM e a JOIN e b ON a.user_id = b.user_id
        |  AND a.event_type = 'click' AND b.event_type = 'purchase'
        |  AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL '10 minutes'
        |ORDER BY a.user_id, left_id, right_id""".stripMargin,

    "q32_events_sessions" ->
      """WITH e AS (
        |  SELECT user_id, date_trunc('microseconds', ts) AS ts, value FROM events),
        |m AS (
        |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
        |      OR ts - lag(ts) OVER w >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |i AS (
        |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM m)
        |SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM i GROUP BY user_id, island
        |ORDER BY user_id, session_start""".stripMargin,

    "q33_events_json" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
        |    / count(json_extract_string(props, '$.k')) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
  )

  /** Language-guess oracle: same stopword lists, votes, tie-break. */
  private def langGuessSql: String = {
    val langs = TextAnalysis.stopwords.keys.toSeq.sorted
    def list(l: String) = TextAnalysis.stopwords(l).map(w => s"'$w'").mkString(", ")
    val votes = langs.map(l => s"count(*) FILTER (WHERE tok IN (${list(l)})) AS votes_$l")
      .mkString(",\n    ")
    val best = s"greatest(${langs.map(l => s"votes_$l").mkString(", ")})"
    val cases = langs.map(l => s"WHEN votes_$l = $best THEN '$l'").mkString("\n    ")
    // LEFT JOIN from documents so zero-token docs keep parity with the
    // Spark side (all-zero votes → 'und') instead of being dropped
    val cv = langs.map(l => s"coalesce(votes_$l, 0) AS votes_$l").mkString(", ")
    s"""WITH $tokCte,
       |v AS (
       |  SELECT doc_id,
       |    $votes
       |  FROM toks GROUP BY doc_id),
       |f AS (
       |  SELECT d.doc_id, $cv
       |  FROM documents d LEFT JOIN v USING (doc_id))
       |SELECT doc_id, ${langs.map(l => s"votes_$l").mkString(", ")},
       |  CASE WHEN $best = 0 THEN 'und'
       |    $cases
       |    ELSE 'und' END AS lang_guess
       |FROM f ORDER BY doc_id""".stripMargin
  }

  /** The sign-LSH bucket expression with the engine's deterministic
    * plane family inlined as literals — reproduces
    * [[graft.ext.Similarity.signBuckets]] bit-for-bit in DuckDB (the
    * planes are md5-derived constants, not RNG draws). */
  private def bucketExprSql(planes: Int, dim: Int): String =
    Similarity.planeFamily(planes, dim).zipWithIndex.map { case (p, i) =>
      s"CASE WHEN list_dot_product(v, [${p.mkString(", ")}]) >= 0 THEN ${1L << i} ELSE 0 END"
    }.mkString("\n    + ")

  /** q72 oracle: the identical md5 plane family inlined as literals,
    * one `list_dot_product` per output dimension. */
  private def randomProjectionOracle: String = {
    val dims = Similarity.planeFamily(8, 64).zipWithIndex.map { case (p, i) =>
      s"{'dim': $i, 'value': list_dot_product(v, [${p.mkString(", ")}])}"
    }.mkString(",\n    ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |u AS (SELECT vec_id, unnest([
       |    $dims]) AS pr FROM e)
       |SELECT vec_id, CAST(pr.dim AS BIGINT) AS dim, pr.value AS value
       |FROM u ORDER BY vec_id, dim""".stripMargin
  }


  /** q245 oracle: the identical bucket/cosine/margin pipeline in SQL
    * with the inlined plane family; DECISIONS only (best target,
    * candidate count, accept flag) reach the hashed contract. */
  private def bitextMineOracle: String =
    s"""WITH src AS (SELECT doc_id AS src_id,
       |    [CASE WHEN doc_id%4 = 0 THEN CAST(doc_id%3 + 1 AS DOUBLE) ELSE 0.0 END,
       |     CASE WHEN doc_id%4 = 1 THEN CAST(doc_id%3 + 1 AS DOUBLE) ELSE 0.0 END,
       |     CASE WHEN doc_id%4 = 2 THEN CAST(doc_id%3 + 1 AS DOUBLE) ELSE 0.0 END,
       |     CASE WHEN doc_id%4 = 3 THEN CAST(doc_id%3 + 1 AS DOUBLE) ELSE 0.0 END] AS v
       |  FROM documents),
       |tgt AS (SELECT * FROM (VALUES
       |    (0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0]),
       |    (2, [0.0, 0.0, 1.0, 0.0]), (3, [0.0, 0.0, 0.0, 1.0]),
       |    (4, [0.6, 0.8, 0.0, 0.0]), (5, [0.0, 0.6, 0.8, 0.0]),
       |    (6, [0.0, 0.0, 0.6, 0.8]), (7, [0.8, 0.0, 0.0, 0.6]))
       |  t(tgt_id, v)),
       |sb AS (SELECT src_id, v, ${bucketExprSql(3, 4)} AS bucket FROM src),
       |tb AS (SELECT tgt_id, v, ${bucketExprSql(3, 4)} AS bucket FROM tgt),
       |cand AS (SELECT src_id, tgt_id,
       |    list_dot_product(sb.v, tb.v) /
       |      (sqrt(list_dot_product(sb.v, sb.v)) *
       |       sqrt(list_dot_product(tb.v, tb.v))) AS sim
       |  FROM sb JOIN tb USING (bucket)),
       |r AS (SELECT *,
       |    row_number() OVER (PARTITION BY src_id ORDER BY sim DESC, tgt_id) AS rs,
       |    row_number() OVER (PARTITION BY tgt_id ORDER BY sim DESC, src_id) AS rt
       |  FROM cand),
       |ds AS (SELECT src_id, avg(sim) AS dsv FROM r WHERE rs <= 4 GROUP BY 1),
       |dt AS (SELECT tgt_id, avg(sim) AS dtv FROM r WHERE rt <= 4 GROUP BY 1),
       |m AS (SELECT r.src_id, r.tgt_id, r.sim / ((dsv + dtv)/2.0) AS margin,
       |    count(*) OVER (PARTITION BY r.src_id) AS nc
       |  FROM r JOIN ds USING (src_id) JOIN dt USING (tgt_id)),
       |best AS (SELECT *, row_number() OVER (PARTITION BY src_id
       |    ORDER BY margin DESC, tgt_id) AS rb FROM m)
       |SELECT src_id, CAST(tgt_id AS BIGINT) AS best_tgt_id,
       |  CAST(nc AS BIGINT) AS n_cands, margin >= 1.02 AS accepted
       |FROM best WHERE rb = 1 ORDER BY src_id""".stripMargin

  /** q29 oracle: bucket both sides with the inlined plane family, score
    * same-bucket candidates, rank — the exact SQL mirror of annTopK. */
  private def annLshOracle: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT vec_id, v, ${bucketExprSql(4, 64)} AS bucket FROM e),
       |q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b
       |      WHERE vec_id IN (0, 1, 2, 3, 4)),
       |s AS (SELECT query_id, c.vec_id AS neighbor_id, list_dot_product(qv, c.v) AS sim
       |      FROM q JOIN b c USING (bucket) WHERE query_id <> c.vec_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY sim DESC, neighbor_id) AS rnk FROM s)
       |SELECT query_id, neighbor_id, sim, CAST(rnk AS BIGINT) AS "rank"
       |FROM r WHERE rnk <= 3
       |ORDER BY query_id, "rank"""".stripMargin

  /** q39 oracle: the deterministic-quantizer IVF pipeline end to end —
    * sign-plane cell assignment (same inlined plane family as q29),
    * per-cell 2^24-grid-quantized centroid means (exact integer sums,
    * so centroid doubles are bit-identical across engines), probe-cell
    * selection by centroid dot product, then scoring restricted to the
    * probed cells. Mirrors ivfBuildDeterministic → ivfQuery exactly;
    * the parquet persist/reload between them is value-preserving. */
  private def annIvfOracle: String = annIvfOracleFor("0, 1, 2, 3, 4")

  /** Shared by q39 (one-shot build) and q109 (build + persisted
    * append): the append contract is build(A ∪ B) exactly, so both
    * oracles are the full-corpus IVF probe, differing only in query
    * ids. */
  private def annIvfOracleFor(queryIdList: String,
                              corpusWhere: String = ""): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |           FROM embeddings$corpusWhere),
       |b AS (SELECT vec_id, v, ${bucketExprSql(4, 64)} AS cell FROM e),
       |ex AS (SELECT cell, r.d, v[r.d] AS x
       |       FROM b CROSS JOIN (SELECT unnest(range(1, 65)) AS d) r),
       |cm AS (SELECT cell, d,
       |         CAST(SUM(CAST(FLOOR(x * 16777216.0) AS BIGINT)) AS DOUBLE)
       |           / COUNT(*) / 16777216.0 AS m
       |       FROM ex GROUP BY cell, d),
       |cent AS (SELECT cell, list(m ORDER BY d) AS c FROM cm GROUP BY cell),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM b
       |      WHERE vec_id IN ($queryIdList)),
       |qc AS (SELECT query_id, qv, cell,
       |         row_number() OVER (PARTITION BY query_id
       |           ORDER BY list_dot_product(qv, c) DESC, cell) AS r
       |       FROM q CROSS JOIN cent),
       |probe AS (SELECT query_id, qv, cell FROM qc WHERE r <= 2),
       |s AS (SELECT query_id, c.vec_id AS neighbor_id,
       |        list_dot_product(qv, c.v) AS sim
       |      FROM probe JOIN b c USING (cell) WHERE query_id <> c.vec_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY sim DESC, neighbor_id) AS rnk FROM s)
       |SELECT query_id, neighbor_id, sim, CAST(rnk AS BIGINT) AS "rank"
       |FROM r WHERE rnk <= 3
       |ORDER BY query_id, "rank"""".stripMargin

  /** q81 oracle: the identical doc_id-derived PII enrichment, RE2
    * regexes (same restricted syntax the Spark side uses), counts via
    * regexp_extract_all and the redaction chain with the 'g' flag
    * (DuckDB replaces only the first match by default). */
  private def piiOracle: String = {
    import graft.ext.TextAnalysis.{EmailRe, Ipv4Re, PhoneRe}
    s"""WITH e AS (SELECT doc_id,
       |  text || ' reach user' || CAST(doc_id AS VARCHAR)
       |    || '@mail.example.com from host 10.'
       |    || CAST(doc_id % 200 AS VARCHAR) || '.'
       |    || CAST(doc_id % 250 AS VARCHAR) || '.7 or call +1-555-'
       |    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(text, '$Ipv4Re')) AS BIGINT) AS n_ips,
       |  CAST(len(regexp_extract_all(text, '$PhoneRe')) AS BIGINT) AS n_phones,
       |  md5(regexp_replace(regexp_replace(regexp_replace(text,
       |    '$EmailRe', '<EMAIL>', 'g'),
       |    '$Ipv4Re', '<IP>', 'g'),
       |    '$PhoneRe', '<PHONE>', 'g')) AS redacted_hash
       |FROM e ORDER BY doc_id""".stripMargin
  }

  /** q82 oracle: containment over the q48 candidate pipeline —
    * `n_shared / least(n_a, n_b)` on distinct shingles. */
  private def containmentOracle: String =
    s"""WITH $lshPairsCtes,
       |dsh AS (SELECT DISTINCT doc_id, sh FROM sh),
       |sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
       |shared AS (
       |  SELECT doc_a, doc_b, count(*) AS n_shared
       |  FROM pairs
       |  JOIN dsh a ON a.doc_id = doc_a
       |  JOIN dsh b ON b.doc_id = doc_b AND b.sh = a.sh
       |  GROUP BY doc_a, doc_b)
       |SELECT doc_a, doc_b, n_shared,
       |  CAST(n_shared AS DOUBLE) / least(sa.n, sb.n) AS containment
       |FROM shared
       |JOIN sizes sa ON sa.doc_id = doc_a
       |JOIN sizes sb ON sb.doc_id = doc_b
       |ORDER BY doc_a, doc_b""".stripMargin

  /** q83 oracle: content-defined chunking — the same md5-addressed
    * boundary rule (first nibble of the 3-token window hash = '0'),
    * final chunk closed at n, chunks hashed over their token span. */
  private def contentChunksOracle: String =
    """WITH d AS (
      |  SELECT doc_id, tl AS toks, len(tl) AS n
      |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tl
      |        FROM documents)
      |  WHERE len(tl) > 0),
      |e0 AS (SELECT doc_id, toks, n,
      |  [i FOR i IN range(3, n + 1)
      |     IF substr(md5(array_to_string(toks[i-2:i], ' ')), 1, 1) = '0'] AS ends0
      |  FROM d),
      |e1 AS (SELECT doc_id, toks,
      |  CASE WHEN len(ends0) > 0 AND ends0[-1] = n THEN ends0
      |       ELSE list_append(ends0, n) END AS ends
      |  FROM e0),
      |e2 AS (SELECT doc_id, toks, ends,
      |  list_prepend(1, [e + 1 FOR e IN ends[1:len(ends)-1]]) AS starts
      |  FROM e1),
      |c AS (SELECT doc_id, toks,
      |  unnest([{'ci': j - 1, 's': starts[j], 'e': ends[j]}
      |          FOR j IN range(1, len(ends) + 1)]) AS ch
      |  FROM e2)
      |SELECT doc_id, CAST(ch.ci AS BIGINT) AS chunk_idx,
      |  CAST(ch.s AS BIGINT) AS first_pos,
      |  CAST(ch.e - ch.s + 1 AS BIGINT) AS n_tokens,
      |  md5(array_to_string(toks[ch.s:ch.e], ' ')) AS chunk_hash
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  /** q113 oracle: BPE training unrolled to `numMerges` generated CTE
    * stages (the pqCtes pattern) — per-stage pair counts, argmax with
    * the (cnt DESC, l, r) tie-break, and merge application as a
    * `list_reduce` string fold over a U+001F-joined segmentation (the
    * same greedy left-to-right rule as `Corpus.applyMerge`; symbols
    * never contain the separator). */
  /** q117 oracle: the DSIR pipeline in SQL — hashed-bucket
    * Laplace-smoothed log-ratios (each `ln` rounded once to 9 dp,
    * carried as DECIMAL so the per-doc sum is order-free), per-token
    * average importance, E-S priorities from the q108 md5-uniform
    * recipe, global top-k. */
  private def dsirSampleOracle(k: Int, buckets: Int): String = {
    def nib(i: Int) = s"(strpos('0123456789abcdef', substr(md5(tok), $i, 1)) - 1)"
    val bkt = s"(${nib(1)} * 4096 + ${nib(2)} * 256 + ${nib(3)} * 16 + ${nib(4)}) % $buckets"
    val hx = "md5('dsir|' || CAST(doc_id AS VARCHAR))"
    val v = (1 to 13).map { i =>
      val w = math.pow(16, 13 - i).toLong
      s"(strpos('0123456789abcdef', substr($hx, $i, 1)) - 1) * $w"
    }.mkString("\n    + ")
    s"""WITH rawtok AS (
       |  SELECT doc_id, $bkt AS bkt FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |    FROM documents WHERE source NOT LIKE 'src1%') WHERE tok <> ''),
       |tgttok AS (
       |  SELECT $bkt AS bkt FROM (
       |    SELECT unnest(string_split(text, ' ')) AS tok
       |    FROM documents WHERE source LIKE 'src1%') WHERE tok <> ''),
       |ct AS (SELECT bkt, count(*) AS c FROM tgttok GROUP BY bkt),
       |cr AS (SELECT bkt, count(*) AS c FROM rawtok GROUP BY bkt),
       |nt AS (SELECT count(*) AS n FROM tgttok),
       |nr AS (SELECT count(*) AS n FROM rawtok),
       |delta AS (
       |  SELECT s.bkt,
       |    CAST(round(ln((COALESCE(ct.c, 0) + 1.0) / (nt.n + $buckets.0)), 9)
       |      AS DECIMAL(28,9))
       |    - CAST(round(ln((COALESCE(cr.c, 0) + 1.0) / (nr.n + $buckets.0)), 9)
       |      AS DECIMAL(28,9)) AS d
       |  FROM (SELECT unnest(range(0, $buckets)) AS bkt) s
       |  LEFT JOIN ct USING (bkt) LEFT JOIN cr USING (bkt)
       |  CROSS JOIN nt CROSS JOIN nr),
       |feat AS (SELECT doc_id, bkt, count(*) AS c FROM rawtok GROUP BY doc_id, bkt),
       |nlen AS (SELECT doc_id, count(*) AS n FROM rawtok GROUP BY doc_id),
       |scored AS (
       |  SELECT f.doc_id, nlen.n AS n_tokens,
       |    CAST(SUM(f.c * d.d) AS DOUBLE) / nlen.n AS avg_logratio
       |  FROM feat f JOIN delta d USING (bkt) JOIN nlen USING (doc_id)
       |  GROUP BY f.doc_id, nlen.n),
       |pri AS (
       |  SELECT doc_id, n_tokens, avg_logratio,
       |    round(ln((CAST($v AS DOUBLE) + 0.5) / 4503599627370496.0)
       |      / exp(avg_logratio), 9) AS p
       |  FROM scored)
       |SELECT rnk, doc_id, n_tokens, avg_logratio, p AS log_priority FROM (
       |  SELECT doc_id, n_tokens, avg_logratio, p,
       |    CAST(row_number() OVER (ORDER BY p DESC, doc_id) AS BIGINT) AS rnk
       |  FROM pri)
       |WHERE rnk <= $k
       |ORDER BY rnk""".stripMargin
  }

  /** q115 oracle: the GD loop unrolled to `steps` generated CTE
    * stages — per-doc decimal-summed margins, 9-dp-rounded sigmoid
    * residuals, per-bucket decimal-summed gradients, the identical
    * arithmetic `TextAnalysis.logregTrain` performs. */
  private def logregTrainOracle(buckets: Int, steps: Int, lr: Double): String = {
    def nib(i: Int) = s"(strpos('0123456789abcdef', substr(md5(tok), $i, 1)) - 1)"
    val head =
      s"""toks AS (
         |  SELECT doc_id, tok FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
         |  WHERE tok <> ''),
         |lab AS (SELECT doc_id,
         |    CASE WHEN source LIKE 'src1%' THEN 1.0 ELSE 0.0 END AS y
         |  FROM documents),
         |feat AS (
         |  SELECT t.doc_id, l.y, t.bkt, CAST(count(*) AS DOUBLE) / n.n AS x
         |  FROM (SELECT doc_id,
         |          (${nib(1)} * 4096 + ${nib(2)} * 256 + ${nib(3)} * 16 + ${nib(4)})
         |            % $buckets AS bkt
         |        FROM toks) t
         |  JOIN (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id) n
         |    USING (doc_id)
         |  JOIN lab l USING (doc_id)
         |  GROUP BY t.doc_id, l.y, t.bkt, n.n),
         |nd AS (SELECT count(DISTINCT doc_id) AS n FROM feat),
         |w0 AS (SELECT unnest(range(0, $buckets)) AS bkt, 0.0 AS w)""".stripMargin
    val stages = (1 to steps).map { k =>
      s"""z$k AS (SELECT f.doc_id, f.y,
         |    CAST(SUM(CAST(round(w.w * f.x, 12) AS DECIMAL(30,12))) AS DOUBLE) AS z
         |  FROM feat f JOIN w${k - 1} w USING (bkt) GROUP BY f.doc_id, f.y),
         |r$k AS (SELECT doc_id,
         |    round(1.0 / (1.0 + exp(-z)), 9) - y AS r FROM z$k),
         |g$k AS (SELECT f.bkt,
         |    CAST(SUM(CAST(round(r.r * f.x, 12) AS DECIMAL(30,12))) AS DOUBLE) AS g
         |  FROM feat f JOIN r$k r USING (doc_id) GROUP BY f.bkt),
         |w$k AS (SELECT w.bkt,
         |    w.w - $lr * COALESCE(g.g, 0.0) / nd.n AS w
         |  FROM w${k - 1} w LEFT JOIN g$k g USING (bkt) CROSS JOIN nd)""".stripMargin
    }
    (head +: stages).mkString("WITH ", ",\n", "") +
      s"\nSELECT CAST(bkt AS BIGINT) AS bucket, round(w, 9) AS weight " +
      s"FROM w$steps ORDER BY bucket"
  }

  /** The shared per-merge CTE chain (p/t/seg tables) the BPE oracles
    * append after a head defining `seg0(word, freq, syms)`. */
  private def bpeStages(numMerges: Int): Seq[String] = {
    val sep = "\u001f"
    (0 until numMerges).map { k =>
      s"""p$k AS (SELECT s.l AS l, s.r AS r, SUM(freq) AS cnt FROM (
         |  SELECT freq, unnest([{'l': syms[i], 'r': syms[i+1]}
         |                       FOR i IN range(1, len(syms))]) AS s
         |  FROM seg$k WHERE len(syms) >= 2) GROUP BY s.l, s.r),
         |t$k AS (SELECT l, r, cnt FROM p$k ORDER BY cnt DESC, l, r LIMIT 1),
         |seg${k + 1} AS (SELECT word, freq,
         |  string_split(list_reduce(syms, (acc, x) -> CASE
         |      WHEN x = t.r AND (acc = t.l OR ends_with(acc, '$sep' || t.l))
         |      THEN substr(acc, 1, length(acc) - length(t.l)) || t.l || x
         |      ELSE acc || '$sep' || x END), '$sep') AS syms
         |  FROM seg$k CROSS JOIN t$k t)""".stripMargin
    }
  }

  private def bpeCtes(numMerges: Int): String = {
    val head =
      """w AS (SELECT t AS word, count(*) AS freq FROM (
        |  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
        |  FROM documents) GROUP BY t),
        |seg0 AS (SELECT word, freq,
        |  [word[i:i] FOR i IN range(1, length(word) + 1)] AS syms FROM w)""".stripMargin
    (head +: bpeStages(numMerges)).mkString(",\n")
  }

  /** q333 CTEs: the GPT-2 byte-to-unicode map replayed arithmetically
    * per byte of hex(encode(word)) — printables (33-126, 161-172,
    * 174-255) map to themselves, control bytes <= 32 to 256+b, the
    * 127-160 run to 289+(b-127), SHY(173) to 323 — then seg0 splits
    * the MAPPED string per char. The corpus is accent-injected so
    * multi-byte UTF-8 sequences genuinely merge. */
  private def byteBpeCtes(numMerges: Int): String = {
    val bv = "((strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1))-1)*16 + " +
      "strpos('0123456789ABCDEF', substr(hx, 2*i, 1))-1)"
    val head =
      s"""w AS (SELECT t AS word, count(*) AS freq FROM (
         |  SELECT unnest(list_filter(string_split(
         |    replace(replace(text, 'a', '\u00e4'), 'e', '\u00e9'), ' '),
         |    x -> x <> '')) AS t
         |  FROM documents) GROUP BY t),
         |wm AS (SELECT word, freq, list_aggregate(
         |  [chr(CAST(CASE
         |     WHEN $bv BETWEEN 33 AND 126 OR $bv BETWEEN 161 AND 172
         |       OR $bv BETWEEN 174 AND 255 THEN $bv
         |     WHEN $bv <= 32 THEN 256 + $bv
         |     WHEN $bv <= 160 THEN 289 + $bv - 127
         |     ELSE 323 END AS INT))
         |   FOR i IN range(1, octet_length(encode(word))+1)],
         |  'string_agg', '') AS mapped
         |  FROM (SELECT word, freq, hex(encode(word)) AS hx FROM w)),
         |seg0 AS (SELECT word, freq,
         |  [mapped[i:i] FOR i IN range(1, length(mapped) + 1)] AS syms
         |  FROM wm)""".stripMargin
    (head +: bpeStages(numMerges)).mkString(",\n")
  }

  /** q334 oracle: the Bradley-Terry MM chain replayed as iterated
    * CTEs under the same 9-dp discipline — per round, denominators
    * sum DECIMAL(28,9) casts of round(n/(p_i+p_j), 9), updates and
    * the mean-1 renormalization round back to the grid. */
  private def bradleyTerryOracle(numIters: Int): String = {
    val head =
      """c AS MATERIALIZED (SELECT 'm' || CAST(doc_id%4 AS VARCHAR) AS model_a,
        |    CASE WHEN doc_id%11 = 0 THEN 'z'
        |      ELSE 'm' || CAST((doc_id%4 + 1)%4 AS VARCHAR) END AS model_b,
        |    CASE WHEN doc_id%11 = 0 THEN 'a' WHEN doc_id%7 < 3 THEN 'a'
        |      WHEN doc_id%7 < 6 THEN 'b' ELSE 'tie' END AS winner
        |  FROM documents),
        |side AS MATERIALIZED (
        |  SELECT model_a AS model,
        |    CASE winner WHEN 'a' THEN 1.0 WHEN 'tie' THEN 0.5
        |      ELSE 0.0 END AS ew,
        |    CASE winner WHEN 'a' THEN 1 ELSE 0 END AS nw,
        |    CASE winner WHEN 'tie' THEN 1 ELSE 0 END AS nt FROM c
        |  UNION ALL
        |  SELECT model_b,
        |    CASE winner WHEN 'b' THEN 1.0 WHEN 'tie' THEN 0.5
        |      ELSE 0.0 END,
        |    CASE winner WHEN 'b' THEN 1 ELSE 0 END,
        |    CASE winner WHEN 'tie' THEN 1 ELSE 0 END FROM c),
        |stats AS MATERIALIZED (SELECT model, SUM(ew) AS eff_wins,
        |    CAST(SUM(nw) AS BIGINT) AS n_wins,
        |    CAST(SUM(nt) AS BIGINT) AS n_ties,
        |    CAST(count(*) AS BIGINT) AS n_comps FROM side GROUP BY model),
        |fit AS MATERIALIZED (SELECT model, CAST(eff_wins AS DOUBLE) AS w
        |  FROM stats WHERE eff_wins > 0),
        |pr AS MATERIALIZED (SELECT m1, m2, CAST(count(*) AS DOUBLE) AS n FROM (
        |    SELECT model_a AS m1, model_b AS m2 FROM c
        |    UNION ALL SELECT model_b, model_a FROM c) x
        |  JOIN fit f1 ON f1.model = x.m1
        |  JOIN fit f2 ON f2.model = x.m2 GROUP BY m1, m2),
        |bt0 AS MATERIALIZED (SELECT model, CAST(1.0 AS DOUBLE) AS p FROM fit)""".stripMargin
    val stages = (0 until numIters).map { k =>
      s"""d$k AS MATERIALIZED (SELECT pr.m1 AS model,
         |    SUM(CAST(round(pr.n / (a.p + b.p), 9) AS DECIMAL(28,9))) AS den
         |  FROM pr JOIN bt$k a ON a.model = pr.m1
         |  JOIN bt$k b ON b.model = pr.m2 GROUP BY pr.m1),
         |u$k AS MATERIALIZED (SELECT f.model, round(f.w / CAST(d.den AS DOUBLE), 9) AS p
         |  FROM fit f JOIN d$k d USING (model)),
         |n$k AS MATERIALIZED (SELECT SUM(CAST(p AS DECIMAL(28,9))) AS tot,
         |    count(*) AS nm FROM u$k),
         |bt${k + 1} AS MATERIALIZED (SELECT model,
         |  round(p * nm / CAST(tot AS DOUBLE), 9) AS p FROM u$k, n$k)""".stripMargin
    }
    s"""WITH ${(head +: stages).mkString(",\n")}
       |SELECT s.model, s.n_wins, s.n_ties, s.n_comps, b.p AS strength
       |FROM stats s LEFT JOIN bt$numIters b USING (model)
       |ORDER BY s.model""".stripMargin
  }

  private def byteBpeTrainOracle(numMerges: Int): String = {
    val union = (0 until numMerges).map { k =>
      s"SELECT CAST(${k + 1} AS BIGINT) AS rank, l AS left_sym, " +
        s"r AS right_sym, CAST(cnt AS BIGINT) AS pair_count FROM t$k"
    }.mkString("\nUNION ALL ")
    s"WITH ${byteBpeCtes(numMerges)}\nSELECT * FROM (\n$union) ORDER BY rank"
  }

  private def bpeTrainOracle(numMerges: Int): String = {
    val union = (0 until numMerges).map { k =>
      s"SELECT CAST(${k + 1} AS BIGINT) AS rank, l AS left_sym, " +
        s"r AS right_sym, CAST(cnt AS BIGINT) AS pair_count FROM t$k"
    }.mkString("\nUNION ALL ")
    s"WITH ${bpeCtes(numMerges)}\nSELECT * FROM (\n$union) ORDER BY rank"
  }

  /** q114 oracle: the final segmentation table (seg`numMerges`) keyed
    * by distinct word, replayed onto the (restricted) token stream —
    * the encode half of the q113 contract. */
  /** q141 oracle: the q113 merge chain's final segmentation (seg`n`)
    * replayed on the full token stream, rolled up per source —
    * words, pieces, chars, pieces/word. Piece lengths partition each
    * word exactly, so n_chars is the word-length sum. */
  private def tokenizerFertilityOracle(numMerges: Int): String =
    s"""WITH ${bpeCtes(numMerges)},
       |tok AS (SELECT doc_id, x.word AS word FROM (
       |  SELECT doc_id, unnest([{'word': tl[i]}
       |                         FOR i IN range(1, len(tl) + 1)]) AS x
       |  FROM (SELECT doc_id,
       |          list_filter(string_split(text, ' '), t -> t <> '') AS tl
       |        FROM documents))),
       |enc AS (SELECT t.doc_id, len(s.syms) AS np, len(t.word) AS nc
       |        FROM tok t JOIN seg$numMerges s ON s.word = t.word)
       |SELECT d.source, count(*) AS n_words,
       |  CAST(SUM(np) AS BIGINT) AS n_pieces,
       |  CAST(SUM(nc) AS BIGINT) AS n_chars,
       |  CAST(SUM(np) AS DOUBLE) / count(*) AS fertility
       |FROM enc JOIN documents d USING (doc_id)
       |GROUP BY d.source ORDER BY d.source""".stripMargin

  /** Shared CTEs for the unigram-tokenizer oracles (q146-q148): the
    * seed vocabulary — substring frequencies weighted by corpus word
    * frequency, single chars always kept, top `vocabSize` multi-char
    * pieces, 9-dp DECIMAL log-probs over the kept total. Ends in
    * `v(piece, freq, logp)`. */
  private def unigramVocabCtes(maxPieceLen: Int, vocabSize: Int): String =
    s"""wrd AS MATERIALIZED (
       |  SELECT w AS word, count(*) AS freq FROM (
       |    SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
       |    FROM documents) GROUP BY 1),
       |subs AS MATERIALIZED (
       |  SELECT s AS piece, CAST(SUM(freq) AS BIGINT) AS freq FROM (
       |    SELECT freq, substr(word, i, l) AS s
       |    FROM wrd, unnest(generate_series(1, len(word))) AS t1(i),
       |         unnest(generate_series(1, least($maxPieceLen, len(word) - i + 1))) AS t2(l))
       |  GROUP BY 1),
       |kept AS MATERIALIZED (
       |  SELECT piece, freq FROM subs WHERE len(piece) = 1
       |  UNION ALL
       |  SELECT piece, freq FROM (
       |    SELECT piece, freq FROM subs WHERE len(piece) > 1
       |    ORDER BY freq DESC, piece LIMIT $vocabSize)),
       |tot AS (SELECT CAST(SUM(freq) AS BIGINT) AS t FROM kept),
       |v AS MATERIALIZED (SELECT piece, freq,
       |        CAST(round(ln(CAST(freq AS DOUBLE) / t), 9) AS DECIMAL(28,9)) AS logp
       |      FROM kept, tot)""".stripMargin

  /** Viterbi-segmentation CTEs (append after [[unigramVocabCtes]]):
    * the per-position DP UNROLLED to `maxWordLen` chained CTEs —
    * DuckDB 1.0's `list_reduce` cannot hold a DP table as its
    * accumulator, so the oracle materializes dp/backtrace one
    * position per CTE (the bpeCtes per-merge pattern). Exact DECIMAL
    * path sums; ties ORDER BY best DESC, start ASC — the same
    * struct-max rule as the Spark side. Ends in
    * `seg(word, piece_idx, piece)`. Words longer than `maxWordLen`
    * would backtrace incompletely — the fixture caps at 8 chars. */
  private def unigramSegCtes(maxPieceLen: Int, maxWordLen: Int): String = {
    val dps = (1 to maxWordLen).map { j =>
      s"""dp$j AS (
         |  SELECT word, best, frm FROM (
         |    SELECT c.word, CAST(p.best + c.logp AS DECIMAL(28,9)) AS best, c.i AS frm,
         |      row_number() OVER (PARTITION BY c.word
         |        ORDER BY CAST(p.best + c.logp AS DECIMAL(28,9)) DESC, c.i ASC) AS rn
         |    FROM cand c JOIN dpall${j - 1} p ON p.word = c.word AND p.pos = c.i
         |    WHERE c.j = $j) WHERE rn = 1),
         |dpall$j AS MATERIALIZED (
         |  SELECT * FROM dpall${j - 1}
         |  UNION ALL SELECT word, $j AS pos, best, frm FROM dp$j),""".stripMargin
    }.mkString("\n")
    val bts = (1 to maxWordLen).map { k =>
      s"""bt$k AS (
         |  SELECT b.word,
         |    CASE WHEN b.pos > 0 THEN d.frm ELSE b.pos END AS pos,
         |    CASE WHEN b.pos > 0 THEN list_prepend(d.frm, b.path) ELSE b.path END AS path
         |  FROM bt${k - 1} b LEFT JOIN dpall$maxWordLen d
         |    ON d.word = b.word AND d.pos = b.pos),""".stripMargin
    }.mkString("\n")
    s"""cand AS (
       |  SELECT x.word, x.i, x.j, v.logp FROM (
       |    SELECT word, i - 1 AS i, i - 1 + l AS j, substr(word, i, l) AS piece
       |    FROM wrd, unnest(generate_series(1, len(word))) AS t1(i),
       |         unnest(generate_series(1, least($maxPieceLen, len(word) - i + 1))) AS t2(l)) x
       |  JOIN v ON v.piece = x.piece),
       |dpall0 AS MATERIALIZED (SELECT word, 0 AS pos, CAST(0 AS DECIMAL(28,9)) AS best, -1 AS frm FROM wrd),
       |$dps
       |bt0 AS (SELECT word, len(word) AS pos, [len(word)] AS path FROM wrd),
       |$bts
       |seg AS MATERIALIZED (
       |  SELECT word, k AS piece_idx,
       |    substr(word, path[k] + 1, path[k + 1] - path[k]) AS piece
       |  FROM bt$maxWordLen, unnest(generate_series(1, len(path) - 1)) AS t(k))""".stripMargin
  }

  /** q146 oracle: the seed vocabulary table itself. logp is DOUBLE in
    * the hashed contract (decimal internal — driver-hash rule). */
  private def unigramVocabOracle: String =
    s"""WITH ${unigramVocabCtes(4, 20)}
       |SELECT piece, freq, CAST(logp AS DOUBLE) AS logp
       |FROM v ORDER BY piece""".stripMargin

  /** q147 oracle: the unrolled Viterbi replayed on the (restricted)
    * token stream. */
  private def unigramSegmentOracle(maxDocId: Long): String =
    s"""WITH ${unigramVocabCtes(4, 20)},
       |${unigramSegCtes(4, 16)},
       |tok AS (SELECT doc_id, x.pos AS pos, x.word AS word FROM (
       |  SELECT doc_id, unnest([{'pos': i, 'word': tl[i]}
       |                         FOR i IN range(1, len(tl) + 1)]) AS x
       |  FROM (SELECT doc_id,
       |          list_filter(string_split(text, ' '), t -> t <> '') AS tl
       |        FROM documents WHERE doc_id < $maxDocId)))
       |SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       |  CAST(piece_idx AS BIGINT) AS piece_idx, piece
       |FROM tok JOIN seg USING (word)
       |ORDER BY doc_id, pos, piece_idx""".stripMargin

  /** q148 oracle: Viterbi piece counts over the full token stream,
    * re-normalized to new 9-dp DECIMAL log-probs. */
  private def unigramReestimateOracle: String =
    s"""WITH ${unigramVocabCtes(4, 20)},
       |${unigramSegCtes(4, 16)},
       |tok AS (SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS word
       |        FROM documents),
       |cnt AS (SELECT piece, count(*) AS freq
       |        FROM tok JOIN seg USING (word) GROUP BY 1),
       |tot2 AS (SELECT CAST(SUM(freq) AS BIGINT) AS t FROM cnt)
       |SELECT piece, freq,
       |  CAST(CAST(round(ln(CAST(freq AS DOUBLE) / t), 9)
       |       AS DECIMAL(28,9)) AS DOUBLE) AS logp
       |FROM cnt, tot2 ORDER BY piece""".stripMargin

  /** Shared CTEs for the trained language-ID oracles (q150, q163):
    * Laplace profiles, 9-dp DECIMAL per-occurrence scores with the
    * unseen floor — ends in `sc(doc_id, lang_true, lang_cand, score)`
    * and `best(doc_id, best_score)`. */
  private def langIdScoreCtes: String =
    s"""base AS (
       |  SELECT doc_id, lang AS lang_true, text FROM documents WHERE len(text) >= 3),
       |dng AS (
       |  SELECT doc_id, lang_true, substr(text, i, 3) AS ng
       |  FROM base, unnest(generate_series(1, len(text) - 2)) AS t(i)),
       |dk AS MATERIALIZED (
       |  SELECT doc_id, lang_true, ng, count(*) AS k FROM dng GROUP BY 1, 2, 3),
       |prof AS MATERIALIZED (
       |  SELECT lang_true AS lang_cand, ng, CAST(SUM(k) AS BIGINT) AS c
       |  FROM dk GROUP BY 1, 2),
       |ltot AS (SELECT lang_cand, CAST(SUM(c) AS BIGINT) AS tot FROM prof GROUP BY 1),
       |vv AS (SELECT count(*) AS V FROM (SELECT DISTINCT ng FROM prof)),
       |li AS MATERIALIZED (
       |  SELECT lang_cand, tot, V,
       |    CAST(round(ln(1.0 / (tot + V)), 9) AS DECIMAL(18,9)) AS fl
       |  FROM ltot, vv),
       |pdt AS (SELECT doc_id, lang_true, CAST(SUM(k) AS BIGINT) AS ktot
       |        FROM dk GROUP BY 1, 2),
       |pres AS MATERIALIZED (
       |  SELECT dk.doc_id, p.lang_cand,
       |    SUM(CAST(dk.k AS DECIMAL(10,0))
       |        * CAST(round(ln(CAST(p.c + 1 AS DOUBLE) / (li.tot + li.V)), 9)
       |               AS DECIMAL(18,9))) AS sp,
       |    CAST(SUM(dk.k) AS BIGINT) AS kp
       |  FROM dk JOIN prof p USING (ng) JOIN li USING (lang_cand)
       |  GROUP BY 1, 2),
       |sc AS MATERIALIZED (
       |  SELECT pdt.doc_id, pdt.lang_true, li.lang_cand,
       |    CAST(coalesce(pres.sp, 0)
       |      + CAST(pdt.ktot - coalesce(pres.kp, 0) AS DECIMAL(10,0)) * li.fl
       |      AS DECIMAL(28,9)) AS score
       |  FROM pdt CROSS JOIN li
       |  LEFT JOIN pres ON pres.doc_id = pdt.doc_id AND pres.lang_cand = li.lang_cand),
       |best AS (SELECT doc_id, max(score) AS best_score FROM sc GROUP BY 1)""".stripMargin

  /** q150 oracle: exact-decimal argmax, ties to min language. */
  private def langIdTrainedOracle: String =
    s"""WITH $langIdScoreCtes
       |SELECT doc_id, lang_true, lang_pred,
       |  lang_pred = lang_true AS correct
       |FROM (SELECT sc.doc_id, sc.lang_true, min(sc.lang_cand) AS lang_pred
       |      FROM sc JOIN best USING (doc_id) WHERE sc.score = best.best_score
       |      GROUP BY 1, 2)
       |ORDER BY doc_id""".stripMargin

  /** q163 oracle: the confidence-margin gate — runner-up language and
    * the exact-decimal margin-vs-threshold decision (the raw margin is
    * deliberately outside the hashed contract, q150's ulp argument). */
  private def langIdMarginOracle(confidenceMargin: Int): String =
    s"""WITH $langIdScoreCtes,
       |predt AS (
       |  SELECT sc.doc_id, sc.lang_true, min(sc.lang_cand) AS lang_pred,
       |    min(best.best_score) AS s1
       |  FROM sc JOIN best USING (doc_id) WHERE sc.score = best.best_score
       |  GROUP BY 1, 2),
       |rest AS (
       |  SELECT sc.doc_id, sc.lang_cand, sc.score, p.s1
       |  FROM sc JOIN predt p USING (doc_id)
       |  WHERE sc.lang_cand <> p.lang_pred),
       |runner AS (SELECT doc_id, max(score) AS s2, min(s1) AS s1 FROM rest GROUP BY 1),
       |rlang AS (
       |  SELECT r.doc_id, min(r.lang_cand) AS runner_up
       |  FROM rest r JOIN runner USING (doc_id) WHERE r.score = runner.s2
       |  GROUP BY 1)
       |SELECT p.doc_id, p.lang_true, p.lang_pred, rlang.runner_up,
       |  coalesce(runner.s1 - runner.s2
       |             >= CAST($confidenceMargin AS DECIMAL(18,9)), TRUE) AS confident
       |FROM predt p
       |LEFT JOIN runner ON runner.doc_id = p.doc_id
       |LEFT JOIN rlang ON rlang.doc_id = p.doc_id
       |ORDER BY p.doc_id""".stripMargin

  /** q144 oracle: per-source epochs = weight·budget/tokens; full
    * epochs repeat every doc, the fractional epoch admits docs whose
    * first two md5 nibbles clear the floor(frac·256) threshold —
    * mixtureSample's 8-bit recipe, upsampling direction. */
  private def epochScheduleOracle(weights: Map[String, Double],
                                  budget: Long): String = {
    // CAST to DOUBLE: DuckDB parses bare 0.3 as DECIMAL and would
    // multiply exactly where Spark's lit(0.3) is already an inexact
    // binary double — at an exact epoch boundary (eps = 2.0 vs
    // 1.999…8) floor/thr would differ by a whole epoch
    val wCase = weights.toSeq.sortBy(_._1)
      .map { case (s, w) => s"WHEN '$s' THEN CAST($w AS DOUBLE)" }
      .mkString("CASE source ", " ", " ELSE CAST(0.0 AS DOUBLE) END")
    val hx = "md5('epoch|' || t.source || '|' || CAST(t.doc_id AS VARCHAR))"
    def nib(i: Int) =
      s"(strpos('0123456789abcdef', substr($hx, $i, 1)) - 1)"
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |tot AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS tok_s
       |        FROM t GROUP BY source),
       |sched AS (
       |  SELECT source,
       |    CAST(FLOOR(eps) AS BIGINT) AS fullep,
       |    CAST(FLOOR((eps - FLOOR(eps)) * 256) AS BIGINT) AS thr
       |  FROM (SELECT source, ($wCase) * CAST($budget AS DOUBLE) / tok_s AS eps FROM tot)),
       |x AS (
       |  SELECT t.doc_id, t.source, t.n_tokens,
       |    fullep + (CASE WHEN ${nib(1)} * 16 + ${nib(2)} < thr
       |              THEN 1 ELSE 0 END) AS ne
       |  FROM t JOIN sched USING (source))
       |SELECT doc_id, source, n_tokens, CAST(ep AS BIGINT) AS epoch
       |FROM (SELECT doc_id, source, n_tokens,
       |        unnest(generate_series(1, ne)) AS ep
       |      FROM x WHERE ne >= 1)
       |ORDER BY doc_id, epoch""".stripMargin
  }

  /** q142 oracle: md5 shard assignment (hash16 of 'shard|id' mod n) +
    * md5 'shuffle|id' priority rank within the shard. */
  private def shuffleShardsOracle(nShards: Int): String = {
    def nib(h: String, i: Int) =
      s"(strpos('0123456789abcdef', substr($h, $i, 1)) - 1)"
    val sh = "md5('shard|' || CAST(doc_id AS VARCHAR))"
    val shard = s"(${nib(sh, 1)} * 4096 + ${nib(sh, 2)} * 256 + " +
      s"${nib(sh, 3)} * 16 + ${nib(sh, 4)}) % $nShards"
    s"""WITH s AS (
       |  SELECT doc_id,
       |    CAST($shard AS BIGINT) AS shard,
       |    md5('shuffle|' || CAST(doc_id AS VARCHAR)) AS pri
       |  FROM documents)
       |SELECT doc_id, shard,
       |  CAST(row_number() OVER (PARTITION BY shard ORDER BY pri, doc_id) AS BIGINT) AS pos
       |FROM s ORDER BY doc_id""".stripMargin
  }

  /** q174 oracle: the dHash gradient bits computed straight from the
    * builder's pixel formula `v(x,y) = (doc_id·7 + x·13 + y·31) % 256`
    * (b=g=r=v makes luma monotone in v, so bit (j,i) is a plain value
    * compare). Bit 63's term is the NEGATIVE 2^63 — two's-complement
    * packing in BIGINT — and terms sum positives-first so no partial
    * overflows. */
  private def bmpDhashTerms(idExpr: String): String = {
    val xs = (0 to 8).map(i => i * 15 / 8)
    val ys = (0 until 8).map(j => j * 15 / 7)
    val terms = for (j <- 0 until 8; i <- 0 until 8) yield {
      val (x1, x2, y) = (xs(i), xs(i + 1), ys(j))
      val idx = 8 * j + i
      val weight = if (idx == 63) "-9223372036854775808"
        else BigInt(2).pow(idx).toString
      s"""(CASE WHEN (($idExpr)*7 + $x2*13 + $y*31) % 256
         |       > (($idExpr)*7 + $x1*13 + $y*31) % 256
         |  THEN CAST($weight AS BIGINT) ELSE 0 END)""".stripMargin
    }
    terms.mkString("\n + ")
  }

  /** q181 oracle terms: the sign-of-delta fingerprint bits from the
    * base waveform `((pat·31 + i·17) % 201) − 100` — the −100 and the
    * per-doc positive gain both cancel in the comparison, so only the
    * mod-201 values compare. Grid `idx_k = ⌊k·127/64⌋` over n=128
    * samples; bit 63's term is the NEGATIVE 2^63 (two's-complement
    * BIGINT packing, the bmpDhashTerms rule). */
  private def wavFingerprintTerms(patExpr: String): String = {
    val idx = (0 to 64).map(k => k * 127 / 64)
    val terms = for (k <- 0 until 64) yield {
      val (i1, i2) = (idx(k), idx(k + 1))
      val weight = if (k == 63) "-9223372036854775808"
        else BigInt(2).pow(k).toString
      s"""(CASE WHEN (($patExpr)*31 + $i2*17) % 201
         |       > (($patExpr)*31 + $i1*17) % 201
         |  THEN CAST($weight AS BIGINT) ELSE 0 END)""".stripMargin
    }
    terms.mkString("\n + ")
  }

  private def bmpDhashOracle: String =
    s"""SELECT doc_id AS media_id, CAST(16 AS INT) AS width,
       |  CAST(16 AS INT) AS height,
       |  (${bmpDhashTerms("doc_id")}) AS dhash
       |FROM documents ORDER BY media_id""".stripMargin

  /** q175 oracle: formula dHashes (25 repeating pixel patterns), then
    * EXACT all-pairs hamming — the blocked Spark form is provably
    * equivalent for maxHamming ≤ 3 (pigeonhole, the q87 argument). */
  private def imageNearDupOracle: String =
    s"""WITH hset AS (
       |  SELECT doc_id, (${bmpDhashTerms("doc_id % 25")}) AS dhash
       |  FROM documents)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
       |FROM hset a JOIN hset b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin

  /** q170 oracle: the q142 shard assignment rolled up with an
    * order-free id checksum — the 12-hex-digit md5 prefix decoded by
    * nibble arithmetic, summed as DECIMAL(38,0). */
  private def shardManifestOracle(nShards: Int): String = {
    def nib(h: String, i: Int) =
      s"(strpos('0123456789abcdef', substr($h, $i, 1)) - 1)"
    val sh = "md5('shard|' || CAST(doc_id AS VARCHAR))"
    val shard = s"(${nib(sh, 1)} * 4096 + ${nib(sh, 2)} * 256 + " +
      s"${nib(sh, 3)} * 16 + ${nib(sh, 4)}) % $nShards"
    val h = "md5(CAST(doc_id AS VARCHAR))"
    val checksum = (1 to 12)
      .map(i => s"CAST(${nib(h, i)} AS HUGEINT) * ${BigInt(16).pow(12 - i)}")
      .mkString(" + ")
    s"""WITH s AS (
       |  SELECT doc_id,
       |    CAST($shard AS BIGINT) AS shard,
       |    CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n,
       |    ($checksum) AS ch
       |  FROM documents)
       |SELECT shard, count(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS n_tokens,
       |  CAST(CAST(SUM(ch) AS DECIMAL(38,0)) AS VARCHAR) AS id_checksum
       |FROM s GROUP BY shard ORDER BY shard""".stripMargin
  }

  private def bpeEncodeOracle(numMerges: Int, maxDocId: Long): String =
    s"""WITH ${bpeCtes(numMerges)},
       |tok AS (SELECT doc_id, x.pos AS pos, x.word AS word FROM (
       |  SELECT doc_id, unnest([{'pos': i, 'word': tl[i]}
       |                         FOR i IN range(1, len(tl) + 1)]) AS x
       |  FROM (SELECT doc_id,
       |          list_filter(string_split(text, ' '), t -> t <> '') AS tl
       |        FROM documents WHERE doc_id < $maxDocId))),
       |enc AS (SELECT t.doc_id, t.pos, s.syms
       |        FROM tok t JOIN seg$numMerges s ON s.word = t.word)
       |SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       |  CAST(y.j AS BIGINT) AS piece_idx, syms[y.j] AS piece
       |FROM (SELECT doc_id, pos, syms,
       |        unnest([{'j': j} FOR j IN range(1, len(syms) + 1)]) AS y
       |      FROM enc)
       |ORDER BY doc_id, pos, piece_idx""".stripMargin

  /** Shared CTEs for the WordPiece oracles (q186, q187): the q113
    * merge-chain pattern with `##`-marked initial symbols, per-stage
    * SYMBOL counts, and the likelihood score `cnt / (c_l · c_r)` —
    * exact IEEE division of exact int64 counts, bit-identical in both
    * engines. Each stage ends in `wt$k` (l, r, cnt, score, m = the
    * joined symbol) and `wseg${k+1}`. */
  private def wpCtes(numMerges: Int): String = {
    val sep = "\u001f"
    val head =
      """w AS (SELECT t AS word, count(*) AS freq FROM (
        |  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
        |  FROM documents) GROUP BY t),
        |wseg0 AS MATERIALIZED (SELECT word, freq,
        |  [CASE WHEN i = 1 THEN word[i:i] ELSE '##' || word[i:i] END
        |   FOR i IN range(1, length(word) + 1)] AS syms FROM w)""".stripMargin
    val stages = (0 until numMerges).map { k =>
      s"""wsc$k AS MATERIALIZED (SELECT s AS sym, SUM(freq) AS c FROM (
         |  SELECT freq, unnest(syms) AS s FROM wseg$k) GROUP BY 1),
         |wp$k AS MATERIALIZED (SELECT s.l AS l, s.r AS r, SUM(freq) AS cnt FROM (
         |  SELECT freq, unnest([{'l': syms[i], 'r': syms[i+1]}
         |                       FOR i IN range(1, len(syms))]) AS s
         |  FROM wseg$k WHERE len(syms) >= 2) GROUP BY s.l, s.r),
         |wt$k AS MATERIALIZED (SELECT l, r, cnt,
         |  CAST(cnt AS DOUBLE) / CAST(sl.c * sr.c AS DOUBLE) AS score,
         |  l || CASE WHEN len(r) > 2 AND starts_with(r, '##')
         |            THEN substr(r, 3) ELSE r END AS m
         |  FROM wp$k JOIN wsc$k sl ON sl.sym = wp$k.l
         |            JOIN wsc$k sr ON sr.sym = wp$k.r
         |  ORDER BY score DESC, l, r LIMIT 1),
         |wseg${k + 1} AS MATERIALIZED (SELECT word, freq,
         |  string_split(list_reduce(syms, (acc, x) -> CASE
         |      WHEN x = t.r AND (acc = t.l OR ends_with(acc, '$sep' || t.l))
         |      THEN substr(acc, 1, length(acc) - length(t.l)) || t.m
         |      ELSE acc || '$sep' || x END), '$sep') AS syms
         |  FROM wseg$k CROSS JOIN wt$k t)""".stripMargin
    }
    (head +: stages).mkString(",\n")
  }

  private def wpTrainOracle(numMerges: Int): String = {
    val union = (0 until numMerges).map { k =>
      s"SELECT CAST(${k + 1} AS BIGINT) AS rank, l AS left_sym, " +
        s"r AS right_sym, CAST(cnt AS BIGINT) AS pair_count, score FROM wt$k"
    }.mkString("\nUNION ALL ")
    s"WITH ${wpCtes(numMerges)}\nSELECT * FROM (\n$union) ORDER BY rank"
  }

  /** q187 oracle: greedy longest-match-first against the trained
    * vocabulary (alphabet ∪ merged symbols), UNROLLED to `maxSteps`
    * chained CTEs (each step consumes ≥1 codepoint; the fixture's
    * words cap at 8) — the unigramSegCtes per-position pattern. A
    * word with no match at some position fails whole to `[UNK]`
    * (can't fire here: the alphabet covers every corpus char). A
    * word still unfinished after `maxSteps` steps emits the sentinel
    * `[ORACLE-TRUNCATED]` — it can only differ from the engine's
    * real pieces, so an undersized `maxSteps` surfaces as a driver
    * MISMATCH instead of a silently truncated piece list. */
  private def wpEncodeOracle(numMerges: Int, maxDocId: Long,
                             maxSteps: Int): String = {
    val mergedUnion = (0 until numMerges)
      .map(k => s"SELECT m AS piece FROM wt$k").mkString(" UNION ALL ")
    val voc =
      s"""voc AS MATERIALIZED (SELECT DISTINCT piece,
         |  len(piece) > 2 AND starts_with(piece, '##') AS is_cont,
         |  CASE WHEN len(piece) > 2 AND starts_with(piece, '##')
         |       THEN substr(piece, 3) ELSE piece END AS body
         |  FROM (SELECT s AS piece FROM (SELECT unnest(syms) AS s FROM wseg0)
         |        UNION ALL $mergedUnion)),
         |tok AS MATERIALIZED (SELECT doc_id, x.pos AS pos, x.word AS word FROM (
         |  SELECT doc_id, unnest([{'pos': i, 'word': tl[i]}
         |                         FOR i IN range(1, len(tl) + 1)]) AS x
         |  FROM (SELECT doc_id,
         |          list_filter(string_split(text, ' '), t -> t <> '') AS tl
         |        FROM documents WHERE doc_id < $maxDocId))),
         |g0 AS MATERIALIZED (SELECT DISTINCT word, 1 AS pos,
         |  CAST([] AS VARCHAR[]) AS pieces, false AS failed FROM tok)""".stripMargin
    val steps = (1 to maxSteps).map { j =>
      s"""c$j AS MATERIALIZED (SELECT s.word, s.pos, s.pieces, v.piece, len(v.body) AS bl,
         |  row_number() OVER (PARTITION BY s.word
         |    ORDER BY len(v.body) DESC, v.piece) AS rn
         |  FROM g${j - 1} s JOIN voc v
         |    ON v.is_cont = (s.pos > 1)
         |   AND substr(s.word, s.pos, len(v.body)) = v.body
         |  WHERE NOT s.failed AND s.pos <= len(s.word)),
         |g$j AS MATERIALIZED (
         |  SELECT word, pos + bl AS pos, list_append(pieces, piece) AS pieces,
         |    false AS failed
         |  FROM c$j WHERE rn = 1
         |  UNION ALL
         |  SELECT s.word, s.pos, s.pieces, true AS failed
         |  FROM g${j - 1} s
         |  WHERE NOT s.failed AND s.pos <= len(s.word)
         |    AND NOT EXISTS (SELECT 1 FROM c$j c WHERE c.word = s.word)
         |  UNION ALL
         |  SELECT word, pos, pieces, failed FROM g${j - 1}
         |  WHERE failed OR pos > len(word))""".stripMargin
    }
    s"""WITH ${wpCtes(numMerges)},
       |$voc,
       |${steps.mkString(",\n")},
       |fin AS (SELECT word,
       |  CASE WHEN failed THEN ['[UNK]']
       |       WHEN pos <= len(word) THEN ['[ORACLE-TRUNCATED]']
       |       ELSE pieces END AS pieces
       |  FROM g$maxSteps)
       |SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       |  CAST(y.j AS BIGINT) AS piece_idx, pieces[y.j] AS piece
       |FROM (SELECT t.doc_id, t.pos, f.pieces,
       |        unnest([{'j': j} FOR j IN range(1, len(f.pieces) + 1)]) AS y
       |      FROM tok t JOIN fin f USING (word))
       |ORDER BY doc_id, pos, piece_idx""".stripMargin
  }

  /** Shared CTE chain for the PQ oracles (q84, q85): per-(vector,
    * subspace) slices with sign-plane codes (global plane ids
    * `m·planes + p` over the subspace dims — the exact literals
    * `Similarity.pqBuild` uses), then grid-quantized per-(m, code)
    * centroids. m=8 subspaces × 8 dims, 4 planes ⇒ 16 codes each. */
  private def pqCtes: String = {
    val (m, planes, d) = (8, 4, 8)
    val family = Similarity.planeFamily(m * planes, d)
    val subBranches = (0 until m).map { mi =>
      val lo = mi * d + 1; val hi = mi * d + d
      val code = (0 until planes).map { p =>
        s"CASE WHEN list_dot_product(v[$lo:$hi], [${family(mi * planes + p).mkString(", ")}]) >= 0 THEN ${1 << p} ELSE 0 END"
      }.mkString("\n      + ")
      s"SELECT vec_id, $mi AS m, v[$lo:$hi] AS sub,\n      $code AS code FROM e"
    }.mkString("\n  UNION ALL ")
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |sub AS (
       |  $subBranches),
       |cx AS (SELECT m, code, r.i AS pos, sub[r.i] AS x
       |       FROM sub CROSS JOIN (SELECT unnest(range(1, ${d + 1})) AS i) r),
       |cm AS (SELECT m, code, pos,
       |         CAST(SUM(CAST(FLOOR(x * 16777216.0) AS BIGINT)) AS DOUBLE)
       |           / COUNT(*) / 16777216.0 AS c
       |       FROM cx GROUP BY m, code, pos),
       |cent AS (SELECT m, code, list(c ORDER BY pos) AS centroid
       |         FROM cm GROUP BY m, code)""".stripMargin
  }

  /** q84 oracle: codes + exact squared reconstruction error per
    * subspace, the same fixed-order three-dot-product combination. */
  private def pqCodesOracle: String =
    s"""WITH $pqCtes
       |SELECT s.vec_id, CAST(s.m AS BIGINT) AS m, CAST(s.code AS BIGINT) AS code,
       |  list_dot_product(s.sub, s.sub)
       |    - 2.0 * list_dot_product(s.sub, c.centroid)
       |    + list_dot_product(c.centroid, c.centroid) AS sq_err
       |FROM sub s JOIN cent c ON c.m = s.m AND c.code = s.code
       |ORDER BY s.vec_id, s.m""".stripMargin

  /** q85 oracle: ADC — per-query (m, code) partial table, decimal-
    * rounded partials summed exactly, rank over the double cast. */
  private def pqAdcOracle: String =
    s"""WITH $pqCtes,
       |lut AS (SELECT s.vec_id AS query_id, s.m, c.code,
       |          CAST(round(list_dot_product(s.sub, c.centroid), 9)
       |            AS DECIMAL(28,9)) AS partial
       |        FROM sub s JOIN cent c ON c.m = s.m
       |        WHERE s.vec_id IN (0, 1, 2, 3, 4)),
       |sc AS (SELECT l.query_id, s2.vec_id AS neighbor_id, SUM(l.partial) AS adc
       |       FROM sub s2 JOIN lut l ON l.m = s2.m AND l.code = s2.code
       |       WHERE s2.vec_id <> l.query_id
       |       GROUP BY l.query_id, s2.vec_id),
       |r AS (SELECT query_id, neighbor_id, CAST(adc AS DOUBLE) AS adc_score,
       |        row_number() OVER (PARTITION BY query_id
       |          ORDER BY CAST(adc AS DOUBLE) DESC, neighbor_id) AS rnk
       |      FROM sc)
       |SELECT query_id, neighbor_id, adc_score, CAST(rnk AS BIGINT) AS "rank"
       |FROM r WHERE rnk <= 3
       |ORDER BY query_id, "rank"""".stripMargin

  /** q94 oracle: the IVF probe chain (q39) feeding the ADC scoring
    * chain (q85) — candidates restricted to each query's 2 best cells,
    * then decimal-exact ADC over the candidate codes only. */
  private def ivfPqOracle: String =
    s"""WITH $pqCtes,
       |b AS (SELECT vec_id, v, ${bucketExprSql(4, 64)} AS cell FROM e),
       |ex AS (SELECT cell, r.d, v[r.d] AS x
       |       FROM b CROSS JOIN (SELECT unnest(range(1, 65)) AS d) r),
       |ccm AS (SELECT cell, d,
       |          CAST(SUM(CAST(FLOOR(x * 16777216.0) AS BIGINT)) AS DOUBLE)
       |            / COUNT(*) / 16777216.0 AS m
       |        FROM ex GROUP BY cell, d),
       |ccent AS (SELECT cell, list(m ORDER BY d) AS c FROM ccm GROUP BY cell),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM b
       |      WHERE vec_id IN (0, 1, 2, 3, 4)),
       |qc AS (SELECT query_id, cell,
       |         row_number() OVER (PARTITION BY query_id
       |           ORDER BY list_dot_product(qv, c) DESC, cell) AS r
       |       FROM q CROSS JOIN ccent),
       |probe AS (SELECT query_id, cell FROM qc WHERE r <= 2),
       |cand AS MATERIALIZED (SELECT query_id, c.vec_id AS neighbor_id
       |         FROM probe JOIN b c USING (cell) WHERE query_id <> c.vec_id),
       |lut AS (SELECT s.vec_id AS query_id, s.m, c.code,
       |          CAST(round(list_dot_product(s.sub, c.centroid), 9)
       |            AS DECIMAL(28,9)) AS partial
       |        FROM sub s JOIN cent c ON c.m = s.m
       |        WHERE s.vec_id IN (0, 1, 2, 3, 4)),
       |sc AS (SELECT ca.query_id, ca.neighbor_id, SUM(l.partial) AS adc
       |       FROM sub s2
       |       JOIN cand ca ON ca.neighbor_id = s2.vec_id
       |       JOIN lut l ON l.query_id = ca.query_id
       |         AND l.m = s2.m AND l.code = s2.code
       |       GROUP BY ca.query_id, ca.neighbor_id),
       |rk AS (SELECT query_id, neighbor_id, CAST(adc AS DOUBLE) AS adc_score,
       |         row_number() OVER (PARTITION BY query_id
       |           ORDER BY CAST(adc AS DOUBLE) DESC, neighbor_id) AS rnk
       |       FROM sc)
       |SELECT query_id, neighbor_id, adc_score, CAST(rnk AS BIGINT) AS "rank"
       |FROM rk WHERE rnk <= 3
       |ORDER BY query_id, "rank"""".stripMargin

  /** q49 oracle: per-bucket near-dup pairs with the same plane family. */
  private def neardupLshOracle: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |           FROM embeddings WHERE vec_id % 4 = 0),
       |b AS (SELECT vec_id, v, ${bucketExprSql(4, 64)} AS bucket FROM e),
       |s AS (SELECT a.vec_id AS id_a, c.vec_id AS id_b,
       |        list_dot_product(a.v, c.v) AS sim
       |      FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id)
       |SELECT id_a, id_b, sim FROM s WHERE sim >= -2.0
       |ORDER BY sim DESC, id_a, id_b LIMIT 20""".stripMargin

  /** q93 oracle: rank by the identical 13-nibble (52-bit) md5 value —
    * the window row_number form the TopK aggregator provably equals. */
  private def exactSampleOracle: String = {
    val hx = "md5(source || '|' || CAST(doc_id AS VARCHAR))"
    val v = (1 to 13).map { i =>
      val w = math.pow(16, 13 - i).toLong
      s"(strpos('0123456789abcdef', substr($hx, $i, 1)) - 1) * $w"
    }.mkString("\n    + ")
    s"""WITH h AS (
       |  SELECT source, doc_id,
       |    $v AS v
       |  FROM documents)
       |SELECT source, rnk, doc_id FROM (
       |  SELECT source, doc_id,
       |    CAST(row_number() OVER (PARTITION BY source ORDER BY v, doc_id)
       |      AS BIGINT) AS rnk
       |  FROM h)
       |WHERE rnk <= 8
       |ORDER BY source, rnk""".stripMargin
  }

  /** q108 oracle: Efraimidis–Spirakis priorities from the identical
    * 52-bit md5 uniform, ranked per source — `ORDER BY pri DESC,
    * doc_id` mirrors the TopK aggregator's tie semantics. */
  private def weightedSampleOracle: String = {
    val hx = "md5(source || '|' || CAST(doc_id AS VARCHAR))"
    val v = (1 to 13).map { i =>
      val w = math.pow(16, 13 - i).toLong
      s"(strpos('0123456789abcdef', substr($hx, $i, 1)) - 1) * $w"
    }.mkString("\n    + ")
    s"""WITH h AS (
       |  SELECT source, doc_id, n_chars,
       |    $v AS v
       |  FROM documents WHERE n_chars > 0),
       |p AS (
       |  SELECT source, doc_id,
       |    round(ln((CAST(v AS DOUBLE) + 0.5) / 4503599627370496.0)
       |      / n_chars, 9) AS pri
       |  FROM h)
       |SELECT source, rnk, doc_id, pri AS log_priority FROM (
       |  SELECT source, doc_id, pri,
       |    CAST(row_number() OVER (PARTITION BY source ORDER BY pri DESC, doc_id)
       |      AS BIGINT) AS rnk
       |  FROM p)
       |WHERE rnk <= 8
       |ORDER BY source, rnk""".stripMargin
  }

  /** q92 oracle: the full curation pipeline — exact dedup (min id per
    * md5(text)), the q48 LSH candidate chain over the surviving docs,
    * recursive min-label components, Gopher rules, PII redaction. */
  private def curationPipelineOracle: String = {
    import graft.ext.TextAnalysis.{EmailRe, Ipv4Re, PhoneRe}
    val stops = TextAnalysis.stopwords("en").map(w => s"'$w'").mkString(", ")
    val mh = (0 until 6).map(i => s"min(substr(md5(sh), ${1 + 5 * i}, 5)) AS mh$i").mkString(",\n    ")
    val bandSelects = (0 until 3).map { b =>
      s"SELECT doc_id, $b AS band, md5(mh${2 * b} || '|' || mh${2 * b + 1}) AS band_key FROM mh"
    }.mkString("\n  UNION ALL ")
    s"""WITH RECURSIVE
       |k1 AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
       |d1 AS (SELECT d.* FROM documents d JOIN k1 USING (doc_id)),
       |sh AS (
       |  SELECT doc_id, unnest(list_transform(
       |    generate_series(1, len(tl) - 2),
       |    i -> array_to_string(tl[i:i+2], ' '))) AS sh
       |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tl
       |        FROM d1)),
       |mh AS (
       |  SELECT doc_id,
       |    $mh
       |  FROM sh GROUP BY doc_id),
       |bands AS (
       |  $bandSelects),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs),
       |reach AS (
       |  SELECT src AS id, dst AS r FROM edges
       |  UNION
       |  SELECT re.id, e2.dst FROM reach re JOIN edges e2 ON re.r = e2.src),
       |comp AS (
       |  SELECT id, least(id, min(r)) AS comp FROM reach GROUP BY id),
       |d2 AS (
       |  SELECT d1.* FROM d1 LEFT JOIN comp c ON d1.doc_id = c.id
       |  WHERE c.id IS NULL OR c.comp = d1.doc_id),
       |t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |      FROM d2),
       |m AS (
       |  SELECT doc_id,
       |    CAST(len(toks) AS BIGINT) AS n_words,
       |    CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks)
       |      AS mean_word_len,
       |    CAST(len(list_filter(toks, x -> contains(x, '#')
       |      OR contains(x, '...') OR contains(x, '…'))) AS BIGINT) AS symbols,
       |    CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT)
       |      AS alphas,
       |    CAST(len(list_filter(toks, x -> list_contains([$stops], x))) AS BIGINT)
       |      AS stops
       |  FROM t WHERE len(toks) > 0),
       |g AS (
       |  SELECT doc_id FROM m
       |  WHERE n_words >= 50 AND n_words <= 100000
       |    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
       |    AND CAST(symbols AS DOUBLE) / n_words <= 0.1
       |    AND CAST(alphas AS DOUBLE) / n_words >= 0.8
       |    AND stops >= 2)
       |SELECT d2.doc_id, d2.source,
       |  regexp_replace(regexp_replace(regexp_replace(d2.text,
       |    '$EmailRe', '<EMAIL>', 'g'),
       |    '$Ipv4Re', '<IP>', 'g'),
       |    '$PhoneRe', '<PHONE>', 'g') AS text,
       |  CAST(len(list_filter(string_split(d2.text, ' '), x -> x <> '')) AS BIGINT)
       |    AS n_tokens
       |FROM d2 JOIN g USING (doc_id)
       |ORDER BY d2.doc_id""".stripMargin
  }

  /** q91 oracle: the identical count-and-exact-ratio rule arithmetic;
    * the stopword list is generated from the same Scala constant so the
    * two sides cannot drift. */
  /** q189 oracle: the domain roll-up in SQL — same planted URLs/dup
    * schedule, gopher-keep conjunction per doc, two-level aggregation,
    * exact int64→double rates, threshold actions. */
  private def domainReputationOracle: String = {
    val stops = TextAnalysis.stopwords("en").map(w => s"'$w'").mkString(", ")
    s"""WITH d AS (
       |  SELECT doc_id,
       |    'site' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' AS domain,
       |    CASE WHEN doc_id % 7 < 2 AND doc_id % 3 = 0
       |         THEN 'Syndicated press release reposted verbatim across the network.'
       |         ELSE text END AS text
       |  FROM documents),
       |t AS (SELECT domain, md5(text) AS fp,
       |        list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |      FROM d),
       |k AS (SELECT domain, fp,
       |  CASE WHEN len(toks) BETWEEN 50 AND 100000
       |    AND CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE)
       |        / len(toks) BETWEEN 3.0 AND 10.0
       |    AND CAST(len(list_filter(toks, x -> contains(x, '#')
       |        OR contains(x, '...') OR contains(x, '…'))) AS DOUBLE)
       |        / len(toks) <= 0.1
       |    AND CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]')))
       |        AS DOUBLE) / len(toks) >= 0.8
       |    AND len(list_filter(toks, x -> list_contains([$stops], x))) >= 2
       |    THEN 1 ELSE 0 END AS keep
       |  FROM t),
       |g AS (SELECT domain, fp, count(*) AS c, sum(keep) AS k
       |      FROM k GROUP BY 1, 2),
       |a AS (SELECT domain,
       |        CAST(sum(c) AS BIGINT) AS n_docs,
       |        CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup,
       |        CAST(sum(k) AS BIGINT) AS n_keep
       |      FROM g GROUP BY 1)
       |SELECT domain, n_docs, n_dup, n_keep,
       |  CAST(n_dup AS DOUBLE) / n_docs AS dup_rate,
       |  CAST(n_keep AS DOUBLE) / n_docs AS keep_rate,
       |  CASE WHEN CAST(n_dup AS DOUBLE) / n_docs > 0.30
       |         OR CAST(n_keep AS DOUBLE) / n_docs < 0.40 THEN 'drop'
       |       WHEN n_docs > 71 THEN 'cap' ELSE 'keep' END AS action
       |FROM a ORDER BY domain""".stripMargin
  }

  /** q192 oracle: C4's rules replayed rule for rule in DuckDB — same
    * planted lines and %13 gate rotation, same line predicates
    * (terminal-punct regex, ≥5 space words, no "javascript"), same
    * page gates (translate-census ≥3 marks, blocklist token from the
    * shared Scala constant, brace / lorem ipsum on the original). */
  private def c4CleanOracle: String = {
    val bad = TextAnalysis.c4Badwords.map(w => s"'$w'").mkString(", ")
    s"""WITH d AS (
       |  SELECT doc_id,
       |    substr(text, 1, 120) || chr(10) || 'Too short.' || chr(10) ||
       |    'This line carries enough words and ends with a period.' || chr(10) ||
       |    'This javascript line carries enough words and ends with a period.' || chr(10) ||
       |    'This line carries plenty of words but never terminates' || chr(10) ||
       |    CASE CAST(doc_id % 13 AS INT)
       |      WHEN 0 THEN 'Operators love lorem ipsum filler inside their pages.'
       |      WHEN 1 THEN 'A brace { sneaks into this otherwise fine sentence.'
       |      WHEN 2 THEN 'The casino word trips the page blocklist gate here.'
       |      ELSE 'A perfectly ordinary closing sentence finishes the page.' END AS text
       |  FROM documents),
       |l AS (
       |  SELECT doc_id, text,
       |    list_filter(string_split(text, chr(10)), ln ->
       |      regexp_matches(rtrim(ln), '[.!?"]$$')
       |      AND len(list_filter(string_split(ln, ' '), w -> w <> '')) >= 5
       |      AND NOT contains(lower(ln), 'javascript')) AS keptl,
       |    len(string_split(text, chr(10))) AS n_lines
       |  FROM d),
       |c AS (
       |  SELECT doc_id, text, CAST(n_lines AS BIGINT) AS n_lines,
       |    CAST(len(keptl) AS BIGINT) AS n_lines_kept,
       |    array_to_string(keptl, chr(10)) AS cleaned
       |  FROM l)
       |SELECT doc_id, n_lines, n_lines_kept, cleaned,
       |  (length(cleaned) - length(translate(cleaned, '.!?', ''))) >= 3
       |  AND len(list_filter(string_split(text, ' '),
       |        w -> list_contains([$bad], lower(w)))) = 0
       |  AND NOT contains(text, '{')
       |  AND NOT contains(lower(text), 'lorem ipsum') AS kept
       |FROM c ORDER BY doc_id""".stripMargin
  }

  private def gopherRulesOracle: String = {
    val stops = TextAnalysis.stopwords("en").map(w => s"'$w'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |  FROM documents),
       |m AS (
       |  SELECT doc_id,
       |    CAST(len(toks) AS BIGINT) AS n_words,
       |    CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks)
       |      AS mean_word_len,
       |    CAST(len(list_filter(toks, x -> contains(x, '#')
       |      OR contains(x, '...') OR contains(x, '…'))) AS BIGINT) AS symbols,
       |    CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT)
       |      AS alphas,
       |    CAST(len(list_filter(toks, x -> list_contains([$stops], x))) AS BIGINT)
       |      AS stops
       |  FROM t WHERE len(toks) > 0)
       |SELECT doc_id, n_words, mean_word_len,
       |  n_words >= 50 AND n_words <= 100000 AS r_word_count,
       |  mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS r_mean_len,
       |  CAST(symbols AS DOUBLE) / n_words <= 0.1 AS r_symbol,
       |  CAST(alphas AS DOUBLE) / n_words >= 0.8 AS r_alpha,
       |  stops >= 2 AS r_stop,
       |  (n_words >= 50 AND n_words <= 100000)
       |    AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
       |    AND (CAST(symbols AS DOUBLE) / n_words <= 0.1)
       |    AND (CAST(alphas AS DOUBLE) / n_words >= 0.8)
       |    AND stops >= 2 AS keep
       |FROM m ORDER BY doc_id""".stripMargin
  }

  /** q88 oracle: the embedding-space dedup pipeline in SQL — sign
    * buckets (the identical md5 plane family), in-bucket COSINE
    * thresholding (dot and norms all in double, same element order as
    * the native expression), recursive min-label components, keep
    * representatives and unpaired vectors. */
  /** q140 oracle: semantic decontamination in SQL — same sign buckets,
    * corpus/eval split on vec_id % 20, threshold 0.25; best match by
    * exact max(sim) then min eval id at that sim. */
  private def semanticDeconOracle: String =
    s"""WITH
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT vec_id, v, ${bucketExprSql(4, 64)} AS bucket FROM e),
       |j AS (
       |  SELECT * FROM (
       |    SELECT c.vec_id AS corpus_id, ev.vec_id AS eval_id,
       |      list_dot_product(c.v, ev.v)
       |        / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(ev.v, ev.v))) AS sim
       |    FROM b c JOIN b ev ON c.bucket = ev.bucket
       |    WHERE c.vec_id % 20 <> 0 AND ev.vec_id % 20 = 0)
       |  WHERE sim >= 0.25),
       |best AS (
       |  SELECT corpus_id, max(sim) AS best_sim, count(*) AS n_matches
       |  FROM j GROUP BY corpus_id)
       |SELECT corpus_id, min(eval_id) AS eval_id, best_sim, n_matches
       |FROM j JOIN best USING (corpus_id)
       |WHERE sim = best_sim
       |GROUP BY corpus_id, best_sim, n_matches
       |ORDER BY corpus_id""".stripMargin

  /** q139 oracle: the mutual-kNN clustering pipeline in SQL — same
    * sign buckets as q88, per-src top-3 by (sim DESC, dst), edges kept
    * only where reciprocated, recursive transitive closure, singletons
    * self-labeled. */
  private def mutualKnnClustersOracle: String =
    s"""WITH RECURSIVE
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT vec_id, v, ${bucketExprSql(4, 64)} AS bucket FROM e),
       |scored AS (
       |  SELECT a.vec_id AS src, c.vec_id AS dst,
       |    list_dot_product(a.v, c.v)
       |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v))) AS sim
       |  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id <> c.vec_id),
       |g AS (
       |  SELECT src, dst FROM (
       |    SELECT src, dst,
       |      row_number() OVER (PARTITION BY src ORDER BY sim DESC, dst) AS rnk
       |    FROM scored) WHERE rnk <= 3),
       |m AS (
       |  SELECT g1.src, g1.dst FROM g g1
       |  JOIN g g2 ON g1.src = g2.dst AND g1.dst = g2.src
       |  WHERE g1.src < g1.dst),
       |edges AS (
       |  SELECT src, dst FROM m
       |  UNION SELECT dst, src FROM m),
       |reach AS (
       |  SELECT src AS id, dst AS r FROM edges
       |  UNION
       |  SELECT re.id, e2.dst FROM reach re JOIN edges e2 ON re.r = e2.src),
       |comp AS (
       |  SELECT id, least(id, min(r)) AS comp FROM reach GROUP BY id)
       |SELECT e.vec_id, coalesce(c.comp, e.vec_id) AS cluster
       |FROM e LEFT JOIN comp c ON e.vec_id = c.id
       |ORDER BY e.vec_id""".stripMargin

  private def semanticDedupOracle: String =
    s"""WITH RECURSIVE
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
       |b AS (SELECT vec_id, v, ${bucketExprSql(4, 64)} AS bucket FROM e),
       |pairs AS (
       |  SELECT a.vec_id AS doc_a, c.vec_id AS doc_b
       |  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
       |  WHERE list_dot_product(a.v, c.v)
       |        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v)))
       |        >= 0.4),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs),
       |reach AS (
       |  SELECT src AS id, dst AS r FROM edges
       |  UNION
       |  SELECT re.id, e2.dst FROM reach re JOIN edges e2 ON re.r = e2.src),
       |comp AS (
       |  SELECT id, least(id, min(r)) AS comp FROM reach GROUP BY id)
       |SELECT e.vec_id, e.label FROM e
       |LEFT JOIN comp c ON e.vec_id = c.id
       |WHERE c.id IS NULL OR c.comp = e.vec_id
       |ORDER BY e.vec_id""".stripMargin

  /** CTE chain ending in `pairs(doc_a, doc_b)` — the LSH candidate
    * pipeline in SQL: minhash (as in q25), 3 bands × 2 rows banding,
    * distinct same-bucket pairs. Shared by the q48 and q50 oracles. */
  private def lshPairsCtes: String = {
    val mh = (0 until 6).map(i => s"min(substr(md5(sh), ${1 + 5 * i}, 5)) AS mh$i").mkString(",\n    ")
    val bandSelects = (0 until 3).map { b =>
      s"SELECT doc_id, $b AS band, md5(mh${2 * b} || '|' || mh${2 * b + 1}) AS band_key FROM mh"
    }.mkString("\n  UNION ALL ")
    s"""$shingleCte,
       |mh AS (
       |  SELECT doc_id,
       |    $mh
       |  FROM sh GROUP BY doc_id),
       |bands AS (
       |  $bandSelects),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id)""".stripMargin
  }

  /** q169 oracle: the exact-integer lazy PageRank unrolled — one CTE
    * block per iteration, pure BIGINT `//` arithmetic (distribute
    * `mass·85 div 100` across neighbors, retain the rest plus the
    * division remainders), over the q48 LSH candidate graph. */
  private def pagerankOracle(iters: Int): String = {
    val steps = (1 to iters).map { k =>
      s"""sh$k AS (
         |  SELECT r.id, r.mass, coalesce(d.deg, 0) AS deg,
         |    CASE WHEN coalesce(d.deg, 0) > 0 THEN (r.mass * 85) // 100 ELSE 0 END AS dist,
         |    CASE WHEN coalesce(d.deg, 0) > 0
         |      THEN ((r.mass * 85) // 100) // d.deg ELSE 0 END AS share
         |  FROM r${k - 1} r LEFT JOIN deg d ON d.id = r.id),
         |infl$k AS (SELECT e.dst AS id, SUM(s.share) AS inm
         |           FROM dir e JOIN sh$k s ON s.id = e.src GROUP BY 1),
         |r$k AS (
         |  SELECT s.id,
         |    s.mass - s.dist + (s.dist - s.share * s.deg) + coalesce(i.inm, 0) AS mass
         |  FROM sh$k s LEFT JOIN infl$k i ON i.id = s.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH $lshPairsCtes,
       |dir AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |        UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs),
       |deg AS (SELECT src AS id, count(*) AS deg FROM dir GROUP BY 1),
       |r0 AS (SELECT doc_id AS id, CAST(1000000000 AS BIGINT) AS mass FROM documents),
       |$steps
       |SELECT id AS doc_id, CAST(mass AS BIGINT) AS mass
       |FROM r$iters ORDER BY doc_id""".stripMargin
  }

  /** q75 oracle: exact Levenshtein over the same candidate pairs. */
  private def editDistNearDupOracle: String =
    s"""WITH $lshPairsCtes
       |SELECT doc_a, doc_b,
       |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist
       |FROM pairs
       |JOIN documents a ON a.doc_id = doc_a
       |JOIN documents b ON b.doc_id = doc_b
       |WHERE levenshtein(a.text, b.text) <= 200
       |ORDER BY doc_a, doc_b""".stripMargin

  /** q63 oracle: the signature-agreement estimator over the same
    * candidate pairs — mh0..mh5 equality votes divided by k. */
  private def jaccardEstimateOracle: String = {
    val votes = (0 until 6)
      .map(i => s"(CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH $lshPairsCtes
       |SELECT doc_a, doc_b, CAST($votes AS DOUBLE) / 6 AS jaccard_est
       |FROM pairs
       |JOIN mh a ON a.doc_id = doc_a
       |JOIN mh b ON b.doc_id = doc_b
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** q48 oracle: the full LSH dedup pipeline in SQL — candidate pairs,
    * then exact Jaccard over distinct shingles for candidates only. */
  private def lshCandidatesOracle: String =
    s"""WITH $lshPairsCtes,
       |dsh AS (SELECT DISTINCT doc_id, sh FROM sh),
       |sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
       |shared AS (
       |  SELECT doc_a, doc_b, count(*) AS n_shared
       |  FROM pairs
       |  JOIN dsh a ON a.doc_id = doc_a
       |  JOIN dsh b ON b.doc_id = doc_b AND b.sh = a.sh
       |  GROUP BY doc_a, doc_b)
       |SELECT doc_a, doc_b, sa.n AS n_a, sb.n AS n_b, n_shared,
       |  CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared) AS jaccard
       |FROM shared
       |JOIN sizes sa ON sa.doc_id = doc_a
       |JOIN sizes sb ON sb.doc_id = doc_b
       |ORDER BY doc_a, doc_b""".stripMargin

  /** q96 oracle: the same band chain, pairs restricted to (existing,
    * new-batch) sides, then the exact-Jaccard verification chain. */
  private def incrementalDedupOracle: String =
    s"""WITH $shingleCte,
       |mh AS (
       |  SELECT doc_id,
       |    ${(0 until 6).map(i => s"min(substr(md5(sh), ${1 + 5 * i}, 5)) AS mh$i").mkString(",\n    ")}
       |  FROM sh GROUP BY doc_id),
       |bands AS (
       |  ${(0 until 3).map { b =>
             s"SELECT doc_id, $b AS band, md5(mh${2 * b} || '|' || mh${2 * b + 1}) AS band_key FROM mh"
           }.mkString("\n  UNION ALL ")}),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_key = b.band_key
       |  WHERE a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0),
       |dsh AS (SELECT DISTINCT doc_id, sh FROM sh),
       |sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
       |shared AS (
       |  SELECT doc_a, doc_b, count(*) AS n_shared
       |  FROM pairs
       |  JOIN dsh a ON a.doc_id = doc_a
       |  JOIN dsh b ON b.doc_id = doc_b AND b.sh = a.sh
       |  GROUP BY doc_a, doc_b)
       |SELECT doc_a, doc_b, sa.n AS n_a, sb.n AS n_b, n_shared,
       |  CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared) AS jaccard
       |FROM shared
       |JOIN sizes sa ON sa.doc_id = doc_a
       |JOIN sizes sb ON sb.doc_id = doc_b
       |ORDER BY doc_a, doc_b""".stripMargin

  /** q50 oracle: duplicate clusters from the LSH candidate pairs via a
    * recursive transitive closure — component = min reachable id. */
  private def dedupComponentsOracle: String =
    s"""WITH RECURSIVE $lshPairsCtes,
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs),
       |reach AS (
       |  SELECT src AS id, dst AS r FROM edges
       |  UNION
       |  SELECT re.id, e.dst FROM reach re JOIN edges e ON re.r = e.src)
       |SELECT id AS doc_id, least(id, min(r)) AS comp
       |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin

  /** q60 oracle: the deduped corpus — drop every component member whose
    * min-reachable label is smaller than its own id. */
  /** q143 oracle: same closure as q60, but the kept member per cluster
    * maximizes the q22 quality score (exact max, ties to min id). */
  private def dedupBestOracle: String =
    s"""WITH RECURSIVE $lshPairsCtes,
       |$tokCte,
       |stats AS (
       |  SELECT doc_id, count(*) AS n_tokens,
       |    CAST(count(DISTINCT tok) AS DOUBLE) / count(*) AS ttr,
       |    CAST(SUM(length(tok)) AS DOUBLE) / count(*) AS avg_len
       |  FROM toks GROUP BY doc_id),
       |q AS (
       |  SELECT doc_id,
       |    least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
       |      + ttr * 0.3 + least(avg_len / 8.0, 1.0) * 0.3 AS quality
       |  FROM stats),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs),
       |reach AS (
       |  SELECT src AS id, dst AS r FROM edges
       |  UNION
       |  SELECT re.id, e.dst FROM reach re JOIN edges e ON re.r = e.src),
       |comp AS (
       |  SELECT id, least(id, min(r)) AS comp FROM reach GROUP BY id),
       |best AS (
       |  SELECT comp.comp, max(q.quality) AS b
       |  FROM comp JOIN q ON q.doc_id = comp.id GROUP BY comp.comp),
       |win AS (
       |  SELECT comp.comp, min(comp.id) AS keep
       |  FROM comp JOIN q ON q.doc_id = comp.id
       |  JOIN best ON best.comp = comp.comp
       |  WHERE q.quality = best.b GROUP BY comp.comp),
       |losers AS (
       |  SELECT comp.id FROM comp JOIN win ON win.comp = comp.comp
       |  WHERE comp.id <> win.keep)
       |SELECT q.doc_id, q.quality FROM q
       |WHERE q.doc_id NOT IN (SELECT id FROM losers)
       |ORDER BY q.doc_id""".stripMargin

  /** q156 oracle: the q60 closure joined back to sources — drop
    * count = members whose component min is not themselves. */
  private def dedupBurdenOracle: String =
    s"""WITH RECURSIVE $lshPairsCtes,
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs),
       |reach AS (
       |  SELECT src AS id, dst AS r FROM edges
       |  UNION
       |  SELECT re.id, e.dst FROM reach re JOIN edges e ON re.r = e.src),
       |comp AS (
       |  SELECT id, least(id, min(r)) AS comp FROM reach GROUP BY id)
       |SELECT d.source, count(*) AS n_docs,
       |  CAST(SUM(CASE WHEN c.id IS NOT NULL AND c.comp <> d.doc_id
       |           THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       |  CAST(SUM(CASE WHEN c.id IS NOT NULL AND c.comp <> d.doc_id
       |           THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS drop_rate
       |FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
       |GROUP BY d.source ORDER BY d.source""".stripMargin

  /** q157 oracle: the q135 quality/label CTE, bucketed at 100, with
    * descending cumulative tp/fp windows. */
  private def thresholdSweepOracle: String =
    s"""WITH $tokCte,
       |stats AS (
       |  SELECT doc_id, count(*) AS n_tokens,
       |    CAST(count(DISTINCT tok) AS DOUBLE) / count(*) AS ttr,
       |    CAST(SUM(length(tok)) AS DOUBLE) / count(*) AS avg_len
       |  FROM toks GROUP BY doc_id),
       |q AS (SELECT d.doc_id,
       |    CASE WHEN d.source LIKE 'src1%' THEN 1 ELSE 0 END AS y,
       |    least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
       |      + ttr * 0.3 + least(avg_len / 8.0, 1.0) * 0.3 AS quality
       |  FROM stats JOIN documents d ON d.doc_id = stats.doc_id),
       |g AS (SELECT least(CAST(FLOOR(quality * 100) AS BIGINT), 99) AS bucket,
       |        CAST(SUM(y) AS BIGINT) AS n_pos,
       |        CAST(SUM(1 - y) AS BIGINT) AS n_neg
       |      FROM q GROUP BY 1),
       |c AS (SELECT bucket, n_pos, n_neg,
       |        CAST(SUM(n_pos) OVER (ORDER BY bucket DESC) AS BIGINT) AS tp,
       |        CAST(SUM(n_neg) OVER (ORDER BY bucket DESC) AS BIGINT) AS fp,
       |        CAST(SUM(n_pos) OVER () AS BIGINT) AS p
       |      FROM g)
       |SELECT bucket, n_pos, n_neg, tp, fp,
       |  CAST(tp AS DOUBLE) / (tp + fp) AS prec,
       |  CAST(tp AS DOUBLE) / p AS recall
       |FROM c ORDER BY bucket""".stripMargin

  private def dedupCorpusOracle: String =
    s"""WITH RECURSIVE $lshPairsCtes,
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs),
       |reach AS (
       |  SELECT src AS id, dst AS r FROM edges
       |  UNION
       |  SELECT re.id, e.dst FROM reach re JOIN edges e ON re.r = e.src),
       |comp AS (
       |  SELECT id, least(id, min(r)) AS comp FROM reach GROUP BY id)
       |SELECT d.doc_id FROM documents d
       |LEFT JOIN comp c ON d.doc_id = c.id
       |WHERE c.id IS NULL OR c.comp = d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** q120 oracle: per-document component label (own id when unpaired)
    * with the q41 md5-nibble split rule applied to the LABEL — the
    * cluster-atomic split. */
  private def clusterSplitOracle: String =
    s"""WITH RECURSIVE $lshPairsCtes,
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs),
       |reach AS (
       |  SELECT src AS id, dst AS r FROM edges
       |  UNION
       |  SELECT re.id, e.dst FROM reach re JOIN edges e ON re.r = e.src),
       |comp AS (SELECT id, least(id, min(r)) AS comp FROM reach GROUP BY id)
       |SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS comp,
       |  CASE WHEN strpos('0123456789abcdef',
       |      substr(md5(CAST(coalesce(c.comp, d.doc_id) AS VARCHAR)), 1, 1)) - 1 < 13
       |    THEN 'train' ELSE 'test' END AS split
       |FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
       |ORDER BY d.doc_id""".stripMargin

  /** q133 oracle: both candidate sets and the exact-Jaccard truth set
    * in one statement — precision/recall from scalar-subquery counts.
    * Reuses the LSH pair CTEs (whose `sh` stream feeds both minhash
    * and, DISTINCT'd, the exact truth) and the simhash CTE family. */
  private def candidateQualityOracle: String =
    s"""WITH $lshPairsCtes,
       |$simhashCtes,
       |shd AS (SELECT DISTINCT doc_id, sh FROM sh),
       |sizes AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY 1),
       |tp0 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ns
       |        FROM shd a JOIN shd b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |        GROUP BY 1, 2),
       |truth AS (SELECT doc_a, doc_b FROM tp0
       |          JOIN sizes sa ON sa.doc_id = doc_a
       |          JOIN sizes sb ON sb.doc_id = doc_b
       |          WHERE CAST(ns AS DOUBLE) / (sa.n + sb.n - ns) >= 0.5),
       |${simhash64CtesNamed("x")},
       |sim AS (SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
       |        FROM s a JOIN s c ON a.doc_id < c.doc_id
       |        WHERE bit_count(xor(a.simhash, c.simhash)) <= 1),
       |sim64 AS (SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
       |        FROM xs a JOIN xs c ON a.doc_id < c.doc_id
       |        WHERE bit_count(xor(a.simhash, c.simhash)) <= 3),
       |m1 AS (SELECT 'minhash_lsh' AS method,
       |        (SELECT count(*) FROM pairs) AS n_candidates,
       |        (SELECT count(*) FROM truth) AS n_truth,
       |        (SELECT count(*) FROM pairs p JOIN truth t
       |           ON p.doc_a = t.doc_a AND p.doc_b = t.doc_b) AS tp),
       |m2 AS (SELECT 'simhash16' AS method,
       |        (SELECT count(*) FROM sim) AS n_candidates,
       |        (SELECT count(*) FROM truth) AS n_truth,
       |        (SELECT count(*) FROM sim p JOIN truth t
       |           ON p.doc_a = t.doc_a AND p.doc_b = t.doc_b) AS tp),
       |m3 AS (SELECT 'simhash64' AS method,
       |        (SELECT count(*) FROM sim64) AS n_candidates,
       |        (SELECT count(*) FROM truth) AS n_truth,
       |        (SELECT count(*) FROM sim64 p JOIN truth t
       |           ON p.doc_a = t.doc_a AND p.doc_b = t.doc_b) AS tp),
       |u AS (SELECT * FROM m1 UNION ALL SELECT * FROM m2
       |      UNION ALL SELECT * FROM m3)
       |SELECT method, CAST(n_candidates AS BIGINT) AS n_candidates,
       |  CAST(n_truth AS BIGINT) AS n_truth, CAST(tp AS BIGINT) AS tp,
       |  CASE WHEN n_candidates = 0 THEN 1.0
       |       ELSE CAST(tp AS DOUBLE) / n_candidates END AS precision,
       |  CASE WHEN n_truth = 0 THEN 1.0
       |       ELSE CAST(tp AS DOUBLE) / n_truth END AS recall
       |FROM u ORDER BY method""".stripMargin

  /** q132 oracle: component sizes → size histogram with the
    * removed-docs column. */
  private def clusterStatsOracle: String =
    s"""WITH RECURSIVE $lshPairsCtes,
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs),
       |reach AS (
       |  SELECT src AS id, dst AS r FROM edges
       |  UNION
       |  SELECT re.id, e.dst FROM reach re JOIN edges e ON re.r = e.src),
       |comp AS (SELECT id, least(id, min(r)) AS comp FROM reach GROUP BY id),
       |sizes AS (SELECT comp, count(*) AS sz FROM comp GROUP BY comp)
       |SELECT sz AS cluster_size, count(*) AS n_clusters,
       |  (sz - 1) * count(*) AS docs_removed
       |FROM sizes GROUP BY sz ORDER BY cluster_size""".stripMargin

  /** CTE chain ending in `s(doc_id, simhash)` — the identical 16-bit
    * nibble-hash construction. Shared by the q26 and q52 oracles. */
  private def simhashCtes: String = {
    def nib(i: Int) = s"(strpos('0123456789abcdef', substr(md5(tok), $i, 1)) - 1)"
    val hv = s"${nib(1)} * 4096 + ${nib(2)} * 256 + ${nib(3)} * 16 + ${nib(4)}"
    val sums = (0 until 16).map { k =>
      s"SUM(CASE WHEN CAST(FLOOR(hv / ${math.pow(2, k).toLong}.0) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END) AS s$k"
    }.mkString(",\n    ")
    val bits = (0 until 16).map { k =>
      s"CASE WHEN s$k >= 0 THEN ${math.pow(2, k).toLong} ELSE 0 END"
    }.mkString(" + ")
    s"""$tokCte,
       |h AS (SELECT doc_id, $hv AS hv FROM toks),
       |b AS (SELECT doc_id, $sums FROM h GROUP BY doc_id),
       |s AS (SELECT doc_id, CAST($bits AS BIGINT) AS simhash FROM b)""".stripMargin
  }

  /** SimHash oracle (q26). */
  private def simhashSql: String =
    s"""WITH $simhashCtes
       |SELECT doc_id, simhash FROM s ORDER BY doc_id""".stripMargin

  /** CTE chain ending in `s(doc_id, simhash)` for the 64-bit
    * fingerprint: per-token nibbles n1..n16 (n1 most significant —
    * md5 hex is big-endian), bit k of the token hash read from nibble
    * `16 - k/4` at in-nibble position `k % 4` (small non-negative
    * ints, so FLOOR/% arithmetic is exact — no signed shifts needed),
    * and bit 63 packed by adding BIGINT min so the result is the same
    * two's-complement value Spark produces. */
  /** The 64-bit simhash chain with prefixed CTE names (assumes `toks`
    * is already defined) — prefixing lets the chain coexist with the
    * 16-bit family in one statement (q133). */
  private def simhash64CtesNamed(p: String): String = {
    def nib(i: Int) = s"(strpos('0123456789abcdef', substr(md5(tok), $i, 1)) - 1) AS n$i"
    val nibs = (1 to 16).map(nib).mkString(",\n    ")
    val sums = (0 until 64).map { k =>
      val j = 16 - k / 4
      val p2 = 1 << (k % 4)
      s"SUM(CASE WHEN CAST(FLOOR(n$j / $p2.0) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END) AS s$k"
    }.mkString(",\n    ")
    val low = (0 until 63).map { k =>
      s"CASE WHEN s$k >= 0 THEN ${1L << k} ELSE 0 END"
    }.mkString(" + ")
    val hi = "CASE WHEN s63 >= 0 THEN -9223372036854775807 - 1 ELSE 0 END"
    s"""${p}n AS (SELECT doc_id, $nibs FROM toks),
       |${p}b AS (SELECT doc_id, $sums FROM ${p}n GROUP BY doc_id),
       |${p}s AS (SELECT doc_id, CAST($low AS BIGINT) + ($hi) AS simhash FROM ${p}b)""".stripMargin
  }

  private def simhash64Ctes: String = s"$tokCte,\n${simhash64CtesNamed("")}"

  /** 64-bit SimHash oracle (q86). */
  private def simhash64Sql: String =
    s"""WITH $simhash64Ctes
       |SELECT doc_id, simhash FROM s ORDER BY doc_id""".stripMargin

  /** q87 oracle: exact all-pairs hamming over the 64-bit fingerprints —
    * the blocked Spark form is provably equivalent (pigeonhole). */
  private def simhash64NearDupOracle: String =
    s"""WITH $simhash64Ctes
       |SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.simhash, c.simhash)) AS BIGINT) AS hamming
       |FROM s a JOIN s c ON a.doc_id < c.doc_id
       |WHERE bit_count(xor(a.simhash, c.simhash)) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin

  /** q52 oracle: exact all-pairs hamming filter — the blocked Spark
    * form is provably equivalent for maxHamming ≤ 3 (pigeonhole). */
  private def simhashNearDupOracle: String =
    s"""WITH $simhashCtes
       |SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.simhash, c.simhash)) AS BIGINT) AS hamming
       |FROM s a JOIN s c ON a.doc_id < c.doc_id
       |WHERE bit_count(xor(a.simhash, c.simhash)) <= 1
       |ORDER BY doc_a, doc_b""".stripMargin

  /** q53 oracle: the same md5-nibble threshold arithmetic inline. */
  private def stratifiedSampleOracle: String = {
    val hx = "md5(CAST(label AS VARCHAR) || '|' || CAST(vec_id AS VARCHAR))"
    def nib(i: Int) = s"(strpos('0123456789abcdef', substr($hx, $i, 1)) - 1)"
    s"""SELECT vec_id, label FROM embeddings
       |WHERE ${nib(1)} * 16 + ${nib(2)} <
       |  CASE CAST(label AS VARCHAR) WHEN '0' THEN 192 WHEN '1' THEN 128 ELSE 64 END
       |ORDER BY vec_id""".stripMargin
  }
}
