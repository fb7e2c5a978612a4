package graft

import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.io.Retrieve

class RetrieveSpec extends AnyFunSuite {

  private def tmpDir() = Files.createTempDirectory("graft-retrieve").toString

  test("download stages a file:// URL and skips an existing copy") {
    val dir = tmpDir()
    val src = Paths.get(dir, "build.gvf")
    Files.write(src, "chr10\tdbSNP\tSNV\n".getBytes)

    val dest = s"$dir/staged/build.gvf"
    assert(Retrieve.download(s"file://$src", dest) == dest)
    assert(Files.readAllLines(Paths.get(dest)).get(0).startsWith("chr10"))

    // skip-if-exists: change the source; the cached copy must survive
    Files.write(src, "CHANGED\n".getBytes)
    Retrieve.download(s"file://$src", dest)
    assert(Files.readAllLines(Paths.get(dest)).get(0).startsWith("chr10"))
    // force re-fetches
    Retrieve.download(s"file://$src", dest, force = true)
    assert(Files.readAllLines(Paths.get(dest)).get(0) == "CHANGED")
  }

  test("gunzip decompresses, defaults the output name, and really skips") {
    val dir = tmpDir()
    val gz = Paths.get(dir, "genes.gtf.gz")
    val out = new GZIPOutputStream(Files.newOutputStream(gz))
    out.write("chr10\thavana\tgene\n".getBytes); out.close()

    val plain = Retrieve.gunzip(gz.toString)
    assert(plain == s"$dir/genes.gtf")
    assert(Files.readAllLines(Paths.get(plain)).get(0).startsWith("chr10"))

    // the reference's _unzip logs the skip but decompresses anyway
    // (eggv/retrieve.py:67-71); ours must actually skip
    Files.write(Paths.get(plain), "KEPT\n".getBytes)
    Retrieve.gunzip(gz.toString)
    assert(Files.readAllLines(Paths.get(plain)).get(0) == "KEPT")
    Retrieve.gunzip(gz.toString, force = true)
    assert(Files.readAllLines(Paths.get(plain)).get(0).startsWith("chr10"))
  }

  test("retrieve names the file from the URL and optionally decompresses") {
    val dir = tmpDir()
    val gz = Paths.get(dir, "chr-10.gvf.gz")
    val out = new GZIPOutputStream(Files.newOutputStream(gz))
    out.write("chr10\tdbSNP\tSNV\n".getBytes); out.close()

    val kept = Retrieve.retrieve(s"file://$gz", s"$dir/raw")
    assert(kept == s"$dir/raw/chr-10.gvf.gz")
    val plain = Retrieve.retrieve(s"file://$gz", s"$dir/raw", decompress = true)
    assert(plain == s"$dir/raw/chr-10.gvf")
    assert(Files.readAllLines(Paths.get(plain)).get(0).startsWith("chr10"))
  }

  test("retrieveAll fetches many URLs concurrently, keeping input order") {
    val dir = tmpDir()
    val urls = (1 to 6).map { i =>
      val src = Paths.get(dir, s"chromosome-$i.gvf")
      Files.write(src, s"chr$i\tdbSNP\tSNV\n".getBytes)
      s"file://$src"
    }
    val staged = Retrieve.retrieveAll(urls, s"$dir/raw", parallelism = 4)
    assert(staged == (1 to 6).map(i => s"$dir/raw/chromosome-$i.gvf"))
    staged.zipWithIndex.foreach { case (p, i) =>
      assert(Files.readAllLines(Paths.get(p)).get(0).startsWith(s"chr${i + 1}\t"))
    }
  }

  test("retrieveAll fails fast when one URL is broken") {
    val dir = tmpDir()
    val good = Paths.get(dir, "ok.gvf")
    Files.write(good, "chr1\n".getBytes)
    val ex = intercept[Exception] {
      Retrieve.retrieveAll(
        Seq(s"file://$good", s"file://$dir/does-not-exist.gvf"), s"$dir/raw")
    }
    assert(ex != null)
  }

  test("retrieveAll rejects distinct URLs sharing a destination file name") {
    val dir = tmpDir()
    val a = Paths.get(dir, "a"); Files.createDirectories(a)
    val b = Paths.get(dir, "b"); Files.createDirectories(b)
    Files.write(a.resolve("chr.gvf"), "chrA\n".getBytes)
    Files.write(b.resolve("chr.gvf"), "chrB\n".getBytes)
    val ex = intercept[IllegalArgumentException] {
      Retrieve.retrieveAll(
        Seq(s"file://$a/chr.gvf", s"file://$b/chr.gvf"), s"$dir/raw")
    }
    assert(ex.getMessage.contains("chr.gvf"))
    // the same URL listed twice is benign (identical content) — allowed
    val staged = Retrieve.retrieveAll(
      Seq(s"file://$a/chr.gvf", s"file://$a/chr.gvf"), s"$dir/raw2")
    assert(staged.distinct.size == 1)
  }

  test("isUrl distinguishes URLs from local paths") {
    assert(Retrieve.isUrl("file:///x/y.gz"))
    assert(Retrieve.isUrl("https://example.org/x.gz"))
    assert(!Retrieve.isUrl("/data/raw/x.gvf"))
    assert(!Retrieve.isUrl("relative/path.gvf"))
  }

  test("EnsemblRegistry: hg38 = 24 per-chromosome GVFs + 1 GTF (globe.py URLs)") {
    import graft.io.EnsemblRegistry
    val urls = EnsemblRegistry.variationUrls("hg38")
    assert(urls.size == 24)
    assert(urls.head ==
      "http://ftp.ensembl.org/pub/release-95/variation/gvf/homo_sapiens/" +
        "homo_sapiens_incl_consequences-chr1.gvf.gz")
    assert(urls.last.endsWith("-chrY.gvf.gz"))
    assert(urls.exists(_.endsWith("-chr22.gvf.gz")))
    assert(urls.exists(_.endsWith("-chrX.gvf.gz")))
    // every URL has a distinct trailing file name → retrieveAll accepts
    // the whole set into one raw dir
    assert(urls.map(_.split('/').last).distinct.size == 24)
    assert(EnsemblRegistry.geneUrl("hg38") ==
      "http://ftp.ensembl.org/pub/release-95/gtf/homo_sapiens/" +
        "Homo_sapiens.GRCh38.95.gtf.gz")
  }

  test("EnsemblRegistry: mm10 = 1 whole-genome GVF + 1 GTF; unknown rejected") {
    import graft.io.EnsemblRegistry
    assert(EnsemblRegistry.variationUrls("mm10") == Seq(
      "http://ftp.ensembl.org/pub/release-95/variation/gvf/mus_musculus/" +
        "mus_musculus_incl_consequences.gvf.gz"))
    assert(EnsemblRegistry.geneUrl("mm10") ==
      "http://ftp.ensembl.org/pub/release-95/gtf/mus_musculus/" +
        "Mus_musculus.GRCm38.95.gtf.gz")
    assert(!EnsemblRegistry.isBuild("hg19"))
    intercept[IllegalArgumentException](EnsemblRegistry.variationUrls("hg19"))
    intercept[IllegalArgumentException](EnsemblRegistry.geneUrl("hg19"))
  }

  test("Main complete accepts --force anywhere among its arguments") {
    assert(Main.parseForce(List("--force", "hg38", "/out")) ==
      (true, List("hg38", "/out")))
    assert(Main.parseForce(List("a.gvf", "b.gtf", "/out", "--force")) ==
      (true, List("a.gvf", "b.gtf", "/out")))
    assert(Main.parseForce(List("hg38", "/out")) == (false, List("hg38", "/out")))
  }
}
