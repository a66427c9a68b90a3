package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.streaming.Sessionize

class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  test("custom-state sessionizer matches native session_window") {
    val ev = Tables.load(spark, sf, "events")
    val typed = ev.select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("value")).as[Sessionize.Ev](Sessionize.evEnc)
    val custom = Sessionize.sessionsCustomState(typed, 86400000000L)
      .collect().map(s => (s.user_id, s.start_us, s.end_us, s.n_events, s.sum_value)).toSet
    val native = Sessionize.sessions(ev, "24 hours")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(custom === native)
  }
}

class VectorFnsSpec extends AnyFunSuite {
  import TestSpark._
  import graft.functions.VectorFns

  test("cosine: self = 1, orthogonal = 0 (basis points)") {
    val s = spark
    import s.implicits._
    // (3,4,0) has an exact norm (5), so self-cosine is exactly 1.0;
    // inexact norms legitimately floor to 9999 bp.
    val df = Seq(
      (Array(3.0f, 4f, 0f), Array(3.0f, 4f, 0f), 10000L),
      (Array(1.0f, 0f, 0f), Array(0f, 3f, 0f), 0L),
      (Array(1.0f, 0f, 0f), Array(-1f, 0f, 0f), -10000L)
    ).toDF("a", "b", "expect")
    val out = df.select(
      VectorFns.cosineBp(VectorFns.toD(col("a")), VectorFns.toD(col("b")),
        VectorFns.norm(VectorFns.toD(col("a"))), VectorFns.norm(VectorFns.toD(col("b"))))
        .as("got"), col("expect")).collect()
    out.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("hyperplanes are deterministic and in [-1000, 1000]") {
    val h1 = VectorFns.hyperplaneInts(3, 64)
    val h2 = VectorFns.hyperplaneInts(3, 64)
    assert(h1 === h2)
    assert(h1.forall(k => k >= -1000 && k <= 1000))
  }

  test("native graft_cosine is bit-equal to the composed zip_with form") {
    graft.plans.GraftExtensions.register(spark)
    val e = sources.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), VectorFns.toD(col("embedding")).as("v"))
    val a = e.select(col("vec_id").as("ia"), col("v").as("va"))
    val b = e.select(col("vec_id").as("ib"), col("v").as("vb"))
    val pairs = a.join(b, col("ia") < col("ib")).limit(500)
    val diff = pairs.select(
      call_function("graft_cosine", col("va"), col("vb")).as("native"),
      VectorFns.cosine(col("va"), col("vb"),
        VectorFns.norm(col("va")), VectorFns.norm(col("vb"))).as("composed"))
      .filter(col("native") =!= col("composed")).count()
    assert(diff === 0L)
  }

  test("FuseCosine rewrites the composed zip_with form to the native expression") {
    val e = sources.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), VectorFns.toD(col("embedding")).as("v"))
    val a = e.select(col("vec_id").as("ia"), col("v").as("va"))
    val b = e.select(col("vec_id").as("ib"), col("v").as("vb"))
    val composed = a.join(b, col("ia") < col("ib"))
      .select(VectorFns.cosine(col("va"), col("vb"),
        VectorFns.norm(col("va")), VectorFns.norm(col("vb"))).as("c"))
    val optimized = composed.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_cosine"),
      s"composed cosine not fused:\n${optimized.take(2000)}")
  }

  test("graft_cosine resolves in plain SQL via the session extension") {
    val n = spark.sql(
      "SELECT graft_cosine(array(3.0d, 4.0d), array(3.0d, 4.0d)) AS c").head().getDouble(0)
    assert(n === 1.0)
  }
}
