package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen

/** Property tests for the risk-register items (SURVEY.md §7):
  * asof `>=` tie semantics under arbitrary version/event layouts, and
  * SCD2 chain invariants (non-overlap, exactly one current per key,
  * idempotent re-application).
  */
class AsOfPropertySpec extends SparkSpec {

  /** Raw-ScalaCheck sampling (the scalatest bridge isn't in the offline
    * cache): run the body over n deterministic samples. */
  private def forSamples[A](gen: Gen[A], n: Int = 10)(body: A => Unit): Unit = {
    val params = Gen.Parameters.default
    (0 until n).foreach { i =>
      gen.apply(params, org.scalacheck.rng.Seed(42L + i)).foreach(body)
    }
  }

  import java.sql.Timestamp

  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000L)

  private val keyGen = Gen.oneOf("k1", "k2", "k3")
  private val secGen = Gen.choose(0L, 500L)
  private val eventsGen = Gen.listOfN(40, Gen.zip(keyGen, secGen))
  private val versionsGen = Gen.listOfN(8, Gen.zip(keyGen, secGen))

  test("asof merge == reference semantics (greatest version ts <= event ts)") {
    forSamples(Gen.zip(eventsGen, versionsGen)) { case (evs, vers) =>
      if (evs.nonEmpty && vers.nonEmpty) {
        import spark.implicits._
        val distinctVers = vers.distinct
        val left = evs.zipWithIndex
          .map { case ((k, s), i) => (k, ts(s), i.toLong) }
          .toDF("k", "event_ts", "row_id")
        val right = distinctVers
          .map { case (k, s) => (k, ts(s), s"$k@$s") }
          .toDF("k", "effective_from", "version")

        val got = AsOfJoin
          .merge(left, right, Seq("k"), "event_ts", "effective_from")
          .select("row_id", "version").as[(Long, Option[String])]
          .collect().toMap

        val expected = evs.zipWithIndex.map { case ((k, s), i) =>
          val candidates = distinctVers.filter(v => v._1 == k && v._2 <= s)
          i.toLong -> (if (candidates.isEmpty) None
            else Some { val b = candidates.maxBy(_._2); s"${b._1}@${b._2}" })
        }.toMap
        assert(got == expected)
      }
    }
  }

  test("null-key bypass is observationally identical when no keys are null") {
    forSamples(Gen.zip(eventsGen, versionsGen)) { case (evs, vers) =>
      if (evs.nonEmpty && vers.nonEmpty) {
        import spark.implicits._
        val left = evs.zipWithIndex
          .map { case ((k, s), i) => (k, ts(s), i.toLong) }
          .toDF("k", "event_ts", "row_id")
        val right = vers.distinct
          .map { case (k, s) => (k, ts(s), s"$k@$s") }
          .toDF("k", "effective_from", "version")
        def run(nkm: Boolean) = AsOfJoin
          .merge(left, right, Seq("k"), "event_ts", "effective_from",
            nullKeysMatch = nkm)
          .select("row_id", "version").as[(Long, Option[String])]
          .collect().toMap
        assert(run(true) == run(false))
      }
    }
  }

  test("Replacing.latestByKey == naive per-key max over random data") {
    forSamples(eventsGen) { evs =>
      if (evs.nonEmpty) {
        import spark.implicits._
        val df = evs.zipWithIndex
          .map { case ((k, s), i) => (k, ts(s), s"p$i") }
          .toDF("k", "updated_at", "payload")
        val got = Replacing.latestByKey(df, Seq("k"), "updated_at")
          .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getString(2)))
          .toSet
        // naive: max (version, payload) tuple per key — the documented
        // deterministic tie-break
        val expected = evs.zipWithIndex
          .map { case ((k, sec), i) => (k, ts(sec), s"p$i") }
          .groupBy(_._1).values
          .map(_.maxBy(r => (r._2.getTime, r._3))).toSet
        assert(got == expected)
      }
    }
  }

  test("SCD2 chain: no overlap, one current per key, idempotent") {
    forSamples(eventsGen) { evs =>
      if (evs.nonEmpty) {
        import spark.implicits._
        import org.apache.spark.sql.functions._
        val bronze = evs.zipWithIndex
          .map { case ((k, s), i) => (k, ts(s), s"attr${s % 3}") }
          .toDF("agent_name", "event_ts", "agent_ip")
        val empty = spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          graft.pipelines.Dims.schemas.dimAgent)
        val dim1 = graft.pipelines.Dims
          .scd2Apply(empty, bronze, graft.pipelines.Dims.agentSpec)
          .cache()

        // exactly one current row per key; currents have null effective_to
        val perKey = dim1.groupBy("agent_name")
          .agg(sum("is_current").as("n_cur")).collect()
        assert(perKey.forall(_.getLong(1) == 1L))
        assert(dim1.filter(col("is_current") === 1 &&
          col("effective_to").isNotNull).count() == 0)

        // intervals don't overlap: each effective_to == next effective_from
        val rows = dim1.orderBy("agent_name", "effective_from")
          .select("agent_name", "effective_from", "effective_to").collect()
        rows.sliding(2).foreach {
          case Array(a, b) if a.getString(0) == b.getString(0) =>
            assert(a.getTimestamp(2) == b.getTimestamp(1))
          case _ => ()
        }

        // idempotent: applying the same window again is a fixpoint
        val dim2 = graft.pipelines.Dims
          .scd2Apply(dim1, bronze, graft.pipelines.Dims.agentSpec)
        assert(dim2.orderBy("agent_name", "effective_from").collect().toSeq
          == dim1.orderBy("agent_name", "effective_from").collect().toSeq)
      }
    }
  }
}
