package graft

import org.apache.hadoop.fs.Path

/** A local filesystem masquerading as a CONDITIONAL-PUT-ONLY object
  * store: exclusive create is honored, but `rename` THROWS for every
  * root-level coordination file — the posture of S3-class stores,
  * where the seqlog committer ([[graft.index.Generations]]
  * `committer=seqlog` + the `casSchemes` opt-in) must run a FULL
  * versioned lifecycle without ever renaming a manifest, lock, or
  * lease.
  *
  * Renames INSIDE a generation directory stay allowed: generation
  * interiors are single-writer maintenance space (tombstone-retirement
  * and dead-sidecar staging swaps, parquet task commits), where plain
  * copy+delete rename — which every object-store connector provides,
  * S3A included — suffices and atomicity is covered by the faces' own
  * staged-recovery protocols. What object stores genuinely lack, and
  * what this mock therefore forbids, is rename as a ROOT-LEVEL commit
  * primitive; a lifecycle that completes against this filesystem
  * proves the commit protocol never reaches for it. */
class CasOnlyMockFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("casonly:///")
  override def getScheme: String = "casonly"

  override def rename(src: Path, dst: Path): Boolean = {
    if (!src.toString.matches(".*/gen\\d+/.*"))
      throw new UnsupportedOperationException(
        s"casonly: rename($src -> $dst) outside a generation dir — " +
        "root-level coordination must never rely on rename")
    super.rename(src, dst)
  }
}
