package graft.sources

/** The filesystem contract every graft COMMIT primitive trusts, made
  * explicit and enforced: the optimistic version claim
  * ([[GraftTableLog.writeSnapshot]]), branch-head CAS / tombstone drop
  * ([[GraftTableLog.casBranchHead]] / `casDropBranch`), the rewrite
  * lock ([[GraftConflicts.withRewriteLock]]), and the shrink-then-grow
  * file swaps all rest on TWO primitives:
  *
  *   1. atomic no-overwrite CREATE (`fs.create(path, false)` — exactly
  *      one of N concurrent creators wins);
  *   2. atomic same-filesystem RENAME.
  *
  * Both hold on HDFS and local filesystems. Neither holds on the plain
  * object-store connectors: S3A's create is check-then-PUT (last
  * writer wins silently) and its rename is copy+delete; GS/ABFS/WASB
  * have related caveats. On such a store the claim is NOT a claim —
  * two committers can both think they own a version and one commit
  * silently vanishes, which is strictly worse than refusing. The
  * object-store port of this log is a MANIFEST FLIP against a
  * conditional-write primitive (S3 If-None-Match, DynamoDB lock, the
  * Delta LogStore discipline) — acknowledged at the design level
  * ([[GraftTableLog]]'s branch notes) and out of scope for the local
  * build, so the honest behavior is to REFUSE schemes known to break
  * the contract rather than corrupt quietly.
  *
  * `-Dgraft.fs.trustAtomicCreate=true` overrides for deployments that
  * front such a store with a consistency layer providing both
  * primitives (e.g. a mounted FUSE layer or a vendor FS shim). */
object GraftFsContract {

  /** URI schemes whose stock Hadoop connectors do NOT provide atomic
    * no-overwrite create + atomic rename. */
  private val NonAtomicSchemes = Set(
    "s3", "s3a", "s3n",            // S3: PUT races, copy+delete rename
    "gs",                          // GCS connector: check-then-act create
    "wasb", "wasbs",               // Azure blob (non-HNS)
    "abfs", "abfss",               // ADLS gen2 (rename caveats under load)
    "oss", "cos", "obs", "swift")  // other object stores

  private def trusted: Boolean =
    sys.props.get("graft.fs.trustAtomicCreate").exists(_.toBoolean)

  /** Refuse a commit-path operation on a table whose scheme is a known
    * non-atomic store (unless explicitly overridden). Called once per
    * commit — a string check, no I/O. */
  def requireAtomicCommitFs(table: String): Unit = {
    if (trusted) return
    val scheme = Option(
      new org.apache.hadoop.fs.Path(table).toUri.getScheme)
      .map(_.toLowerCase(java.util.Locale.ROOT))
    scheme.filter(NonAtomicSchemes.contains).foreach { s =>
      throw new UnsupportedOperationException(
        s"graft: transactional commits under $table refuse on '$s://' — " +
          "the optimistic claim needs atomic no-overwrite create and " +
          "atomic rename, which this store's connector does not " +
          "provide; a silent lost commit would be the failure mode. " +
          "Run on HDFS/local, front the store with a consistency " +
          "layer and set -Dgraft.fs.trustAtomicCreate=true, or use a " +
          "conditional-write manifest service (the Delta LogStore / " +
          "Iceberg catalog discipline).")
    }
  }
}
