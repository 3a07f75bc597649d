package graft

/** A local filesystem masquerading under a foreign scheme — the mock
  * for [[graft.index.Generations]]' object-store guard spec: "mock" is
  * not in the atomic-rename allowlist, so writer entry points must
  * refuse it unless the deployment opts in. */
class NonAtomicMockFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("mock:///")
  override def getScheme: String = "mock"
}
