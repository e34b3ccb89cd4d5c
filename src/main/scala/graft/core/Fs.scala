package graft.core

/** Tiny shared filesystem helpers (driver-side only — data moves through
  * Spark jobs, never through these). */
object Fs {

  /** Recursive delete; no-op on missing paths, never throws on a file
    * that vanishes mid-walk. */
  def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete(); ()
  }
}
