package graft.io

/** Ensembl release-95 feature-build registry: species/build → the exact
  * download set, mirroring the reference's hardcoded URL templates
  * (eggv/globe.py:44-49) and chromosome lists (eggv/globe.py:52-53).
  *
  * hg38 variation is published per-chromosome (22 autosomes + X + Y → 24
  * GVF files, eggv/retrieve.py:227-252 submits one download per
  * chromosome); mm10 variation is one file; each build has one GTF gene
  * build. With this registry `graft.Main complete hg38 <outDir>` needs
  * zero caller-supplied URLs — the reference's `eggv complete -s hg38`
  * convenience (eggv/cli.py:43-77).
  */
object EnsemblRegistry {

  val release = 95

  private val base = s"http://ftp.ensembl.org/pub/release-$release"

  /** eggv/globe.py:52 — 22 autosomes + X + Y. */
  val humanChromosomes: Seq[String] = (1 to 22).map(_.toString) ++ Seq("X", "Y")

  /** eggv/globe.py:53 (listed by the reference; its mm10 variation URL is
    * a single whole-genome file, so the list drives nothing today). */
  val mouseChromosomes: Seq[String] = (1 to 19).map(_.toString) ++ Seq("X", "Y")

  val supportedBuilds: Seq[String] = Seq("hg38", "mm10")

  def isBuild(s: String): Boolean = supportedBuilds.contains(s)

  /** Variant (GVF) download set for a build — 24 per-chromosome files for
    * hg38, one whole-genome file for mm10. */
  def variationUrls(build: String): Seq[String] = build match {
    case "hg38" => humanChromosomes.map(c =>
      s"$base/variation/gvf/homo_sapiens/homo_sapiens_incl_consequences-chr$c.gvf.gz")
    case "mm10" => Seq(
      s"$base/variation/gvf/mus_musculus/mus_musculus_incl_consequences.gvf.gz")
    case other => throw new IllegalArgumentException(
      s"unknown build '$other' (supported: ${supportedBuilds.mkString(", ")})")
  }

  /** Gene (GTF) build URL. */
  def geneUrl(build: String): String = build match {
    case "hg38" => s"$base/gtf/homo_sapiens/Homo_sapiens.GRCh38.$release.gtf.gz"
    case "mm10" => s"$base/gtf/mus_musculus/Mus_musculus.GRCm38.$release.gtf.gz"
    case other => throw new IllegalArgumentException(
      s"unknown build '$other' (supported: ${supportedBuilds.mkString(", ")})")
  }
}
