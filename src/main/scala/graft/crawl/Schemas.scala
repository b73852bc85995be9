package graft.crawl

import java.sql.Timestamp

/** Engine row types (SURVEY.md §1.2-§1.3, FIXTURES.md §2.3).
  *
  * `files` schema follows the reference DDL (storcrawl.py:132-148) with
  * the SURVEY §1.2 type mapping: paths as STRING for display plus
  * `pathBytes` carrying the exact readdir bytes (reference bytea
  * parity via [[PathBytes]]; the DSv2 source's `pathMode=binary`
  * emits them as BinaryType columns), st_mode rendered as the 19-char
  * binary string, times as truncated epoch seconds.
  */
final case class RawEntry(
    path: String,
    parent: String,
    name: String,
    isDir: Boolean,
    isSymlink: Boolean,
    pathBytes: Array[Byte] = Array.emptyByteArray)

/** One stat-enriched row per directory entry. Divergence A3: on a stat
  * error we emit null stats + the error text instead of replaying the
  * previous entry's struct (storcrawl.py:427,434-440). */
final case class FileMeta(
    path: String,
    extension: Option[String],
    st_mode: Option[String],
    st_ino: Option[Long],
    st_dev: Option[String],
    st_nlink: Option[Int],
    st_uid: Option[Long],
    st_gid: Option[Long],
    st_size: Option[Long],
    st_atime: Option[Long],
    st_mtime: Option[Long],
    st_ctime: Option[Long],
    owner: Option[String],
    error: Option[String])

/** Flat status schema (legacy reader schema the report layer queries —
  * SURVEY.md §1.3 decision A11; README.md:59-66 of the reference). */
final case class StatusRow(
    id: Long,
    time: Timestamp,
    status: String,
    value: Double,
    units: String)
