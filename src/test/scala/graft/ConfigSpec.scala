package graft

import java.util.Properties

import org.scalatest.funsuite.AnyFunSuite

class ConfigSpec extends AnyFunSuite {

  private def props(kv: (String, String)*): Properties = {
    val p = new Properties()
    kv.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  test("defaults apply when the file sets nothing") {
    val cfg = GraftConfig.fromProperties(props())
    assert(cfg.build == "hg38" && cfg.dataDir == "data" && !cfg.overwrite)
    assert(cfg.cores > 0 && cfg.shufflePartitions == cfg.cores)
  }

  test("values override defaults and shuffle follows cores unless set") {
    val cfg = GraftConfig.fromProperties(props(
      "data.dir" -> "/scratch/graft", "build" -> "mm10",
      "overwrite" -> "true", "cores" -> "8"))
    assert(cfg.build == "mm10" && cfg.dataDir == "/scratch/graft")
    assert(cfg.overwrite && cfg.cores == 8 && cfg.shufflePartitions == 8)
    assert(cfg.catalog.genesDir == "/scratch/graft/mm10/processed/genes")
    val explicit = GraftConfig.fromProperties(props(
      "cores" -> "8", "shuffle.partitions" -> "64"))
    assert(explicit.shufflePartitions == 64)
  }

  test("validation lists every problem, not just the first") {
    val e = intercept[IllegalArgumentException] {
      GraftConfig.fromProperties(props(
        "build" -> "hg19", "cores" -> "-2", "speling.mistake" -> "x"))
    }
    assert(e.getMessage.contains("unknown build: hg19"))
    assert(e.getMessage.contains("cores must be a positive integer"))
    assert(e.getMessage.contains("unknown config key: speling.mistake"))
  }

  test("retrieve.registry parses, defaults off, and rejects non-booleans") {
    assert(!GraftConfig.fromProperties(props()).retrieveFromRegistry)
    val on = GraftConfig.fromProperties(props("retrieve.registry" -> "true"))
    assert(on.retrieveFromRegistry)
    // every known build has a registry download set, so a config that can
    // validate can always stage (24+1 URLs for hg38, 1+1 for mm10)
    for (b <- GraftConfig.knownBuilds) {
      assert(graft.io.EnsemblRegistry.variationUrls(b).nonEmpty)
      assert(graft.io.EnsemblRegistry.geneUrl(b).nonEmpty)
    }
    val e = intercept[IllegalArgumentException] {
      GraftConfig.fromProperties(props("retrieve.registry" -> "yes"))
    }
    assert(e.getMessage.contains("retrieve.registry must be true/false"))
  }

  test("load reads a properties file from disk") {
    val f = java.nio.file.Files.createTempFile("graft", ".properties")
    java.nio.file.Files.write(f, "build=mm10\ndata.dir=/tmp/d\n".getBytes)
    val cfg = GraftConfig.load(f.toString)
    assert(cfg.build == "mm10" && cfg.dataDir == "/tmp/d")
  }
}
