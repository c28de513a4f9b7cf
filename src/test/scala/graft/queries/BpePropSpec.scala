package graft.queries

import graft.SparkSpec
import org.scalatest.prop.TableDrivenPropertyChecks
import scala.util.Random

/** Property check: the distributed BPE trainer must agree with a
  * straightforward single-machine reference on random corpora — pair
  * counting over ALL adjacent positions, (count desc, pair) winner
  * selection, and the left-to-right non-overlapping replace-scan merge
  * (java.lang.String.replace — the same semantics Spark's and DuckDB's
  * literal replace implement).
  */
class BpePropSpec extends SparkSpec with TableDrivenPropertyChecks {
  import spark.implicits._

  /** Reference BPE on a (word, count) table. */
  private def referenceBpe(
      words: Seq[(String, Long)], rounds: Int): Seq[(Long, String, String, Long)] = {
    var ws: Seq[(String, Long)] = words.map { case (w, n) =>
      (" " + w.flatMap(c => s"$c ") , n)
    }
    (1 to rounds).flatMap { i =>
      val pairCounts = collection.mutable.Map.empty[(String, String), Long]
      ws.foreach { case (s, n) =>
        val syms = s.trim.split(" ").toSeq
        syms.zip(syms.drop(1)).foreach { p =>
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + n
        }
      }
      if (pairCounts.isEmpty) Nil
      else {
        val ((a, b), cnt) = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        ws = ws.map { case (s, n) => (s.replace(s" $a $b ", s" $a$b "), n) }
        Seq((i.toLong, a, b, cnt))
      }
    }
  }

  test("distributed BPE == reference on random corpora (20 seeds)") {
    for (seed <- 1 to 20) {
      val rnd = new Random(seed)
      val alphabet = "abc"
      val words = (1 to (3 + rnd.nextInt(8))).map { _ =>
        (1 to (1 + rnd.nextInt(6))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }.distinct.map(w => (w, 1L + rnd.nextInt(9).toLong))
      val rounds = 3
      val expected = referenceBpe(words, rounds)
      val got = Curation.bpeTrainOn(words.toDF("w", "n"), rounds)._1
      assert(got === expected, s"seed=$seed corpus=$words")
    }
  }

  test("merged type table reflects exactly the learned merges") {
    val words = Seq(("abab", 5L), ("abc", 2L), ("cab", 1L))
    val (merges, typeTable) = Curation.bpeTrainOn(words.toDF("w", "n"), 2)
    // replay the merges on the reference representation
    var ref = words.map { case (w, n) => (w, " " + w.flatMap(c => s"$c ")) }.toMap.map {
      case (w, s) => (w, merges.foldLeft(s) { case (acc, (_, a, b, _)) =>
        acc.replace(s" $a $b ", s" $a$b ") })
    }
    val got = typeTable.collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got === ref)
  }
}
