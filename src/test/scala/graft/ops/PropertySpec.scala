package graft.ops

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.model.FkEdge

/** ScalaCheck property tests for the driver-side metadata algorithms
  * (SURVEY.md §5 layer 3). Pure Scala — no SparkSession needed.
  */
object MetadataProperties extends Properties("graft.ops") {

  property("partition: chunks concat to input, all chunks ≤ n") =
    forAll(Gen.listOf(Gen.choose(0, 1000)), Gen.choose(1, 50)) { (xs, n) =>
      val chunks = SqlText.partition(xs, n)
      chunks.flatten == xs && chunks.forall(_.size <= n) &&
        chunks.dropRight(1).forall(_.size == n)
    }

  // random DAG: edges only from lower-numbered to higher-numbered tables
  private val dagGen: Gen[(Seq[String], Seq[FkEdge])] = for {
    n <- Gen.choose(2, 12)
    tables = (0 until n).map(i => s"t$i")
    edges <- Gen.listOf(for {
      a <- Gen.choose(0, n - 2)
      b <- Gen.choose(a + 1, n - 1)
    } yield FkEdge(s"e$a$b", s"t$a", "pk", s"t$b", "fk"))
  } yield (tables, edges)

  property("toposort: output is a permutation that respects every edge") =
    forAll(dagGen) { case (tables, edges) =>
      val order = TopoSort.sort(tables, edges)
      val pos = order.zipWithIndex.toMap
      order.sorted == tables.sorted &&
        edges.forall(e => pos(e.parentTable) < pos(e.childTable))
    }

  property("toposort: adding a back edge to a chain is rejected as a cycle") =
    forAll(Gen.choose(3, 10)) { n =>
      val tables = (0 until n).map(i => s"t$i")
      val chain = (0 until n - 1).map(i => FkEdge(s"e$i", s"t$i", "pk", s"t${i + 1}", "fk"))
      val cyclic = chain :+ FkEdge("back", s"t${n - 1}", "pk", "t0", "fk")
      Prop.throws(classOf[RuntimeException])(TopoSort.sort(tables, cyclic))
    }

  property("edge exclusion: excluding every edge's forward form empties the set") =
    forAll(dagGen) { case (_, edges) =>
      val exclusions = edges.map(e => s"${e.childTable}.${e.childColumn}=${e.parentTable}.${e.parentColumn}")
      Exclusions.filterRelationships(edges, exclusions).isEmpty
    }

  property("path DSL round-trip: parse(print(edge)) == edge") =
    forAll(Gen.identifier.suchThat(_.nonEmpty), Gen.identifier.suchThat(_.nonEmpty)) { (p, c) =>
      val pks = Map(p -> s"${p}_pk")
      (p != c) ==> {
        val path = s"$p->$c.${c}_fk"
        val e = PathDsl.parse(path, pks)
        e.parentTable == p && e.childTable == c && e.childColumn == s"${c}_fk" &&
          e.parentColumn == s"${p}_pk"
      }
    }
}
