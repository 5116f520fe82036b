package graft

import graft.fixtures.Fixtures
import graft.metrics.PipelineMetrics

class MetricsSpec extends SparkTestBase {

  test("observe() metrics ride inside the job and surface stage mix") {
    val pm = new PipelineMetrics(spark)
    try {
      val dict = Fixtures.dict(spark)
      val turns = Fixtures.transcripts(spark, 20, 6)
      val res = Pipeline.run(spark, turns, dict)
      val nLinks = res.links.count()
      // listener delivery is async; poll briefly
      val deadline = System.nanoTime() + 15e9.toLong
      while (pm.snapshot.get("graft_links").isEmpty && System.nanoTime() < deadline)
        Thread.sleep(100)
      val m = pm.snapshot
      assert(m.contains("graft_links"), s"metrics seen: ${m.keySet}")
      val links = m("graft_links")
      assert(links("n_links").asInstanceOf[Long] == nLinks)
      val exact = links("n_exact").asInstanceOf[Long]
      val fuzzy = links("n_fuzzy").asInstanceOf[Long]
      val semantic = links("n_semantic").asInstanceOf[Long]
      assert(exact + fuzzy + semantic == nLinks)
      assert(exact > 0 && semantic > 0, s"exact=$exact fuzzy=$fuzzy semantic=$semantic")
    } finally pm.unregister()
  }
}
