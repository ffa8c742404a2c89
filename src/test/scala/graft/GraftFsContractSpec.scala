package graft

import graft.sources.GraftFsContract

/** The supported-filesystem contract ([[graft.sources.GraftFsContract]]):
  * commit primitives trust atomic no-overwrite create + atomic rename,
  * so a table on a stock object-store connector must REFUSE loudly
  * (silent lost commits are the alternative), local/HDFS paths pass,
  * and the explicit trust override re-enables object-store schemes for
  * deployments that front them with a consistency layer. */
class GraftFsContractSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("local and hdfs paths pass") {
    GraftFsContract.requireAtomicCommitFs("/tmp/t")
    GraftFsContract.requireAtomicCommitFs("file:///tmp/t")
    GraftFsContract.requireAtomicCommitFs("hdfs://nn:8020/warehouse/t")
  }

  test("object-store schemes refuse, naming the failure mode and outs") {
    Seq("s3a://bucket/t", "s3://bucket/t", "gs://bucket/t",
      "abfss://c@acct.dfs.core.windows.net/t", "wasb://c@acct/t")
      .foreach { p =>
        val e = intercept[UnsupportedOperationException] {
          GraftFsContract.requireAtomicCommitFs(p)
        }
        assert(e.getMessage.contains("atomic no-overwrite create"), p)
        assert(e.getMessage.contains("trustAtomicCreate"), p)
      }
  }

  test("the trust override re-enables object-store schemes") {
    val k = "graft.fs.trustAtomicCreate"
    sys.props(k) = "true"
    try GraftFsContract.requireAtomicCommitFs("s3a://bucket/t")
    finally sys.props.remove(k)
  }
}
