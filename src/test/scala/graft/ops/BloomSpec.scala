package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The sharded bloom is the named scale-up path of the single 16 KB
  * filter (Bloom.scala scaladoc): same no-false-negative guarantee, same
  * pure-projection probe, but capacity grows by SHARD COUNT while every
  * piece stays metadata-sized.
  */
class BloomSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val Shards = 4

  private lazy val fps = Tables.documents(spark, sf)
    .select(col("doc_id"), md5(col("text")).as("fp"))
  private lazy val corpus = fps.filter(col("doc_id") % 4 =!= 1).select("fp").distinct()
  private lazy val shardedBits =
    Bloom.collectShardedBits(Bloom.buildSharded(corpus, Shards), Shards)

  test("sharded build: every piece metadata-sized, every shard populated") {
    assert(shardedBits.length === Shards)
    assert(shardedBits.forall(_.length === Bloom.Words)) // 16 KB each
    // the shard digit (last hex char) spreads a real corpus across all shards
    assert(shardedBits.forall(_.exists(_ != 0L)), "an unpopulated shard filter")
  }

  test("sharded probe: no false negatives, end-to-end") {
    // every corpus member MUST probe true — the property that makes the
    // pre-screen transparent to the downstream exact anti-join
    val missed = corpus
      .filter(!Bloom.candidateColSharded("fp", shardedBits))
      .count()
    assert(missed === 0L, s"$missed false negatives")
  }

  test("sharding never admits more candidates than the single filter") {
    // each shard filter carries ~1/S of the load at the same m, so its
    // false-positive rate can only drop; with the same probes the sharded
    // candidate set is a subset of the single-filter one
    val single = Bloom.collectBits(Bloom.build(corpus))
    val probes = fps.select("fp") // members and non-members
    val nSingle = probes.filter(Bloom.candidateCol("fp", single)).count()
    val nSharded = probes.filter(Bloom.candidateColSharded("fp", shardedBits)).count()
    val nMembers = probes.join(corpus, Seq("fp"), "left_semi").count()
    assert(nSharded <= nSingle, s"sharded $nSharded > single $nSingle")
    assert(nSharded >= nMembers, "a candidate set smaller than the member set is a false negative")
  }

  test("probe stays projection-only and transparent past 4 shards (7-shard fold)") {
    // the scale path grows SHARD COUNT, so the probe's CASE fold must not
    // degrade as literals accumulate: 7 shards (non-power-of-2 exercises
    // the mod spread) keeps no-false-negatives, plans join- and
    // shuffle-free, and stays inside whole-stage codegen
    val s7 = 7
    val bits7 = Bloom.collectShardedBits(Bloom.buildSharded(corpus, s7), s7)
    assert(bits7.count(_.exists(_ != 0L)) === s7, "all 7 shard filters populated")
    assert(corpus.filter(!Bloom.candidateColSharded("fp", bits7)).count() === 0L,
      "false negatives at 7 shards")
    val probe = fps.select("fp").withColumn("cand", Bloom.candidateColSharded("fp", bits7))
    val plan = probe.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"probe must not join:\n$plan")
    assert(!plan.contains("Exchange"), s"probe must not shuffle:\n$plan")
    // executedPlan.toString renders a codegen'd stage as "*(n) Op"
    assert(plan.contains("*(1) Project"), s"probe fell out of codegen:\n$plan")
  }

  test("the sharded probe plans as a pure projection: no join, no shuffle") {
    val probe = Tables.documents(spark, sf)
      .select(md5(col("text")).as("fp"))
      .withColumn("cand", Bloom.candidateColSharded("fp", shardedBits))
    val plan = probe.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"probe must not join:\n$plan")
    assert(!plan.contains("Exchange"), s"probe must not shuffle:\n$plan")
  }
}
