package graft

import java.nio.file.Files

import graft.sources.SnapshotTable

/** The catalog plugin: snapshot tables driven entirely from SQL —
  * CREATE / INSERT / SELECT / DELETE / SHOW / DROP — resolving through
  * `graft.sources.v2.SnapshotCatalog` onto the same transactional
  * format the path-based API uses.
  */
class SnapshotCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base: String = {
    val dir = Files.createTempDirectory("graft_catalog").toString
    spark.conf.set("spark.sql.catalog.snap", classOf[graft.sources.v2.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.snap.base", dir)
    dir
  }

  test("CREATE / INSERT / SELECT / DELETE / DROP round-trip in SQL") {
    base // force catalog conf
    spark.sql("CREATE TABLE snap.ev (id BIGINT, v STRING)")
    assert(SnapshotTable.currentVersion(s"$base/ev").contains(0))

    spark.sql("INSERT INTO snap.ev VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql("INSERT INTO snap.ev VALUES (4, 'd')")
    // each INSERT is one transactional commit
    assert(SnapshotTable.currentVersion(s"$base/ev").contains(2))
    assert(spark.sql("SELECT * FROM snap.ev").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    assert(spark.sql("SELECT v FROM snap.ev WHERE id = 2").as[String].head() == "b")

    spark.sql("DELETE FROM snap.ev WHERE id >= 3")
    assert(spark.sql("SELECT id FROM snap.ev").as[Long].collect().toSet == Set(1L, 2L))
    // the delete committed a new version; pre-delete state time-travels
    // through the path API
    assert(SnapshotTable.read(spark, s"$base/ev", Some(2)).count() == 4)

    assert(spark.sql("SHOW TABLES IN snap").collect().map(_.getString(1)).contains("ev"))
    spark.sql("DROP TABLE snap.ev")
    assert(SnapshotTable.currentVersion(s"$base/ev").isEmpty)
  }

  test("INSERT OVERWRITE truncates as a new version; CTAS-less append path") {
    base
    spark.sql("CREATE TABLE snap.ow (id BIGINT, v STRING)")
    spark.sql("INSERT INTO snap.ow VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT OVERWRITE snap.ow VALUES (9, 'z')")
    assert(spark.sql("SELECT * FROM snap.ow").as[(Long, String)].collect().toSeq ==
      Seq((9L, "z")))
    spark.sql("DROP TABLE snap.ow")
  }

  test("SQL time travel: VERSION AS OF reads an old snapshot") {
    base
    spark.sql("CREATE TABLE snap.tt (id BIGINT)")
    spark.sql("INSERT INTO snap.tt VALUES (1), (2)") // v1
    spark.sql("INSERT INTO snap.tt VALUES (3)")      // v2
    assert(spark.sql("SELECT count(*) FROM snap.tt VERSION AS OF 1").as[Long].head() == 2L)
    assert(spark.sql("SELECT count(*) FROM snap.tt").as[Long].head() == 3L)
    spark.sql("DROP TABLE snap.tt")
  }

  test("catalog and path API are the same table") {
    base
    spark.sql("CREATE TABLE snap.shared (id BIGINT)")
    SnapshotTable.append(Seq(7L, 8L).toDF("id"), s"$base/shared")
    assert(spark.sql("SELECT sum(id) FROM snap.shared").as[Long].head() == 15L)
    spark.sql("DROP TABLE snap.shared")
  }
}
