package graft

/** Library identity surfaced by the `heartbeat` query (O19 — the
  * reference's Heartbeat RPC returns its package version,
  * `/root/reference/src/cores/database.rs:204-213`). Kept in sync with
  * `build.sbt`'s `ThisBuild / version`. */
object BuildInfo {
  val version: String = "0.1.0"
}
