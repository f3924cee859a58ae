package graft.tools

import org.apache.spark.sql.functions._

/** Scratch profiler for the q110 residual (VERDICT r17 item 6): what
  * does the broadcast-assign corpus pass actually spend its 20 s on —
  * the window exchange, the cosine arithmetic, or the codebook read? */
object Q110Profile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("scaledata/sf1")
    val s = graft.Sessions.local()
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PHASE $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val emb = graft.ops.Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val cents = t("codebook read (persist-and-probe)") {
      val c = graft.sim.KMeans.storedCodebook(s, d).localCheckpoint(true)
      println("  nlist: " + c.count()); c
    }
    t("assign via window (current)") {
      val a = graft.sim.SimilarityQueries.ivfAssign(emb, cents)
        .select("vec_id", "cent_id")
      println("  rows: " + a.count())
    }
    t("assign via slim struct-max aggregate") {
      val a = emb.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("cent_id"),
          graft.functions.GraftFunctions.fusedCosine(col("e"), col("ce")).as("c"))
        .groupBy("vec_id")
        .agg(max(struct(round(col("c"), 6).as("c"), (-col("cent_id")).as("nc"))).as("m"))
        .select(col("vec_id"), (-col("m.nc")).as("cent_id"))
      println("  rows: " + a.count())
    }
    t("full registered q110 (first run)") {
      println("  rows: " + graft.sim.KMeans.kmeansAssign(s, d).count())
    }
    t("full registered q110 (second run)") {
      println("  rows: " + graft.sim.KMeans.kmeansAssign(s, d).count())
    }
    t("slim assign from storedCodebook only") {
      println("  rows: " + graft.sim.SimilarityQueries.ivfAssignSlim(
        emb, graft.sim.KMeans.storedCodebook(s, d)).count())
    }
    val assigned = graft.sim.SimilarityQueries.ivfAssignSlim(
      emb, graft.sim.KMeans.storedCodebook(s, d))
    t("a) assigned.count") { println("  " + assigned.count()) }
    val sizes = assigned.groupBy("cent_id").agg(count(lit(1)).as("cluster_size"))
    t("b) sizes.count") { println("  " + sizes.count()) }
    t("c) join count") {
      println("  " + assigned.join(broadcast(sizes), "cent_id").count())
    }
    s.stop()
  }
}
