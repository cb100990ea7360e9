package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.JsMini
import graft.functions.JsMini._
import graft.sources.JsIngest

/** The JavaScript ingestion connector (dozer-ingestion/javascript):
  * bootstrap script → ingest envelopes → json_records table.
  */
class JsIngestSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  /** The reference's own bootstrap (js_extension/ingest.js) with its
    * two environment seams swapped: `fetch` is host-injected (this
    * engine has no network runtime) and the deno-internal ingest op
    * path resolves through the injected `Deno` object unchanged.
    */
  private val referenceScript =
    """(async () => {
      |    const url = 'https://api.github.com/repos/getdozer/dozer/commits';
      |    const response = await fetch(url);
      |
      |    const commits = await response.json();
      |
      |    const snapshot_msg = { typ: "SnapshottingDone", old_val: null, new_val: null };
      |    await Deno[Deno.internal].core.ops.ingest(snapshot_msg);
      |
      |    for (const commit of commits) {
      |        const msg = {
      |            typ: "Insert",
      |            old_val: null,
      |            new_val: { commit: commit.sha },
      |        };
      |        await Deno[Deno.internal].core.ops.ingest(msg);
      |    }
      |})();""".stripMargin
      .replace("for (const commit of commits)", "for (let commit of commits)")

  private val cannedFetch: (String, V) = "fetch" -> VNative("fetch", { _ =>
    JsMini.obj("json" -> VNative("json", { _ =>
      JsMini.arr(
        JsMini.obj("sha" -> VStr("abc123"), "author" -> VStr("a")),
        JsMini.obj("sha" -> VStr("def456"), "author" -> VStr("b")))
    }))
  })

  test("reference bootstrap script emits snapshot marker then inserts") {
    val changes = JsIngest.runScript(referenceScript, Map(cannedFetch))
    assert(changes.map(_.op) == Seq("SnapshottingDone", "Insert", "Insert"))
    assert(changes(1).new_val == """{"commit":"abc123"}""")
    assert(changes(2).new_val == """{"commit":"def456"}""")
    assert(changes.head.new_val == null && changes.head.old_val == null)
  }

  test("json_records replays Insert/Update/Delete by whole-value identity") {
    val script =
      """ingest({ typ: "Insert", old_val: null, new_val: { k: 1 } });
        |ingest({ typ: "Insert", old_val: null, new_val: { k: 2 } });
        |ingest({ typ: "Update", old_val: { k: 1 }, new_val: { k: 10 } });
        |ingest({ typ: "Delete", old_val: { k: 2 }, new_val: null });
        |ingest({ typ: "Insert", old_val: null, new_val: { k: 3 } });
        |""".stripMargin
    val rows = JsIngest.jsonRecords(spark, script)
      .collect().map(_.getString(0)).sorted.toSeq
    assert(rows == Seq("""{"k":10}""", """{"k":3}"""))
  }

  test("invalid envelope typ raises the connector contract error") {
    val e = intercept[JsError] {
      JsIngest.runScript("""ingest({ typ: "Upsert", new_val: 1 });""")
    }
    assert(e.getMessage.contains("Upsert"))
  }

  test("config end-to-end: !JavaScript connection feeds pipeline SQL") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_js_src").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$tmp/bootstrap.js"),
      """ingest({ typ: "SnapshottingDone", old_val: null, new_val: null });
        |for (let i = 1; i <= 4; i++) {
        |  ingest({ typ: "Insert", old_val: null, new_val: { n: i, sq: i * i } });
        |}
        |""".stripMargin.getBytes("UTF-8"))
    val yaml =
      s"""connections:
         |  - name: jsconn
         |    config: !JavaScript
         |      bootstrap_path: $tmp/bootstrap.js
         |sources:
         |  - name: recs
         |    connection: jsconn
         |    table_name: json_records
         |sql: |
         |  SELECT CAST(get_json_object(value, '$$.sq') AS BIGINT) AS sq INTO out1 FROM recs;
         |sinks:
         |  - table: out1
         |    path: $tmp/out
         |    mode: overwrite
         |""".stripMargin
    GraftApp.runBatch(spark, GraftConfigLoader.fromYaml(yaml))
    val out = spark.read.parquet(s"$tmp/out")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(1L, 4L, 9L, 16L))
  }

  test("a JavaScript connection exposes only json_records") {
    val yaml =
      """connections:
        |  - name: jsconn
        |    config: !JavaScript
        |      bootstrap_path: /nope/bootstrap.js
        |sources:
        |  - name: recs
        |    connection: jsconn
        |    table_name: other_table
        |sql: SELECT 1 AS x INTO o FROM recs;
        |sinks: []
        |""".stripMargin
    val e = intercept[IllegalArgumentException](GraftConfigLoader.fromYaml(yaml))
    assert(e.getMessage.contains("json_records"))
  }
}
