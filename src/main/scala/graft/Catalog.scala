package graft

/** Dataset path layout — the engine's catalog, mirroring the reference's
  * singleton path registry (eggv/globe.py:14-109) without the singleton:
  * a Catalog is an immutable value parameterized by base directory and
  * build, so concurrent pipelines over different builds can't clobber each
  * other's state (the reference's Globals().reinitialize(build=...) is
  * process-global and mutable).
  */
final case class Catalog(baseDir: String, build: String = "hg38") {
  private def d(parts: String*): String = (baseDir +: parts).mkString("/")

  // raw inputs (eggv/globe.py:64-71)
  def variantRawDir: String = d(build, "raw", "variants")
  def geneRawFile: String = d(build, "raw", "genes")
  /** Same location as `geneRawFile`, read as a directory: URL staging drops
    * the fetched GTF inside it, and the scan globs the directory — so a
    * staged `run <config> <gvf> <gtf>` and a pre-staged catalog `run
    * <config>` read identical layouts. */
  def geneRawDir: String = geneRawFile

  // processed intermediates (eggv/globe.py:85-103)
  def variantEffectsDir: String = d(build, "processed", "variant-effects")
  def variantMetadataDir: String = d(build, "processed", "variant-metadata")
  def genesDir: String = d(build, "processed", "genes")
  def genesDedupedDir: String = d(build, "processed", "genes-deduped")

  // annotated outputs (eggv/globe.py:104-109)
  def intergenicDir: String = d(build, "annotated", "intergenic")
  def intragenicDir: String = d(build, "annotated", "intragenic")
}
