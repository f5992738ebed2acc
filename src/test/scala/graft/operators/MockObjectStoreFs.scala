package graft.operators

/** A RawLocalFileSystem wearing an object-store-like `mock:` scheme —
  * the WriterLease scheme-contract tests need a filesystem whose
  * create-if-absent is the NON-atomic Hadoop default (check-then-create)
  * and whose scheme is outside the atomic allowlist, without any real
  * object store in the container. Registered via `fs.mock.impl`.
  */
class MockObjectStoreFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("mock:///")
}
