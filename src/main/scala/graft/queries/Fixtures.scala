package graft.queries

/** Fixture-directory hygiene shared by the /tmp-staging queries: every
  * layout/streaming/round-trip query starts from an empty path so a
  * previous run's files (or manifests) can't leak into the result.
  */
private[graft] object Fixtures {

  /** Recursively delete `dir` if present and return it. Local-FS only
    * (the fixture queries stage under /tmp); null-guarded listFiles so
    * an unreadable entry can't NPE the cleanup.
    */
  def fresh(dir: String): String = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rm)
      f.delete()
    }
    rm(new java.io.File(dir))
    dir
  }
}
