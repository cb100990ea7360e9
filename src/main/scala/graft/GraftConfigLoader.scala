package graft

import scala.jdk.CollectionConverters._
import graft.GraftApp.{GraftConfig, SinkConf, SourceConf}

/** YAML config loader — the `dozer run <config>` entry point
  * (SURVEY §3 entry point 1). Two accepted shapes:
  *
  * **graft-native** (the migration target):
  * {{{
  * sources:
  *   - name: orders
  *     path: /data/sf/orders.parquet
  *     format: parquet            # optional, default parquet (csv/json/orc/delta/…)
  *     options: {header: "true"}  # optional reader passthrough
  *     watermark: {column: ts, delay: 10 minutes}   # optional
  * sql: |
  *   SELECT ... INTO out1 FROM orders;
  * sinks:
  *   - table: out1
  *     path: /out/out1
  *     mode: append | upsert | overwrite
  *     keys: [k]                  # upsert primary key
  *     format: parquet            # optional (append/overwrite may use delta/…)
  *     options: {compression: zstd}  # optional writer passthrough
  *     checkpoint: /ckpt/out1     # streaming only
  * streaming: false
  * }}}
  *
  * **dozer-compatible** (reference config.rs / dozer-config.yaml,
  * e.g. dozer-ingestion/benches/connectors.sample.yaml): `connections`
  * with `!LocalStorage` object-store configs, `sources` referencing
  * them by name + `table_name`, the same `sql`, and `sinks` with
  * `table_name`. YAML application tags (`!LocalStorage`, `!Table`,
  * `!Parquet`…) are stripped before parsing — the loader infers the
  * connector from the fields present and supports the object-store
  * connector (the one whose data Spark can reach directly); other
  * connectors (Postgres CDC, Kafka…) raise with the documented
  * config-level mapping (SURVEY §2.1).
  */
object GraftConfigLoader {

  def fromYamlFile(path: String): GraftConfig =
    fromYaml(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path))))

  def fromYaml(text: String): GraftConfig = {
    val root = parseRoot(text).asScala.toMap
    if (root.contains("connections")) fromDozer(root) else fromNative(root)
  }

  private def parseRoot(text: String): java.util.Map[String, Object] = {
    // snakeyaml's safe loader rejects unknown application tags; dozer's
    // enum tags only disambiguate connector types we re-infer from the
    // fields themselves. Only strip tags in tag position (preceded by
    // whitespace / line start) — a '!word' embedded in a quoted value
    // (a path, a SQL string) must survive.
    val cleaned = text.replaceAll("(?m)(^|(?<=\\s))!\\w+", "")
    // SafeConstructor rejects all application/global tags (incl. `!!`
    // global tags the strip regex cannot reach), closing the
    // arbitrary-object-instantiation path; the regex above remains as
    // compatibility shimming for dozer's enum tags, not as a defense.
    val yaml = new org.yaml.snakeyaml.Yaml(
      new org.yaml.snakeyaml.constructor.SafeConstructor(
        new org.yaml.snakeyaml.LoaderOptions()))
    yaml.load[java.util.Map[String, Object]](cleaned)
  }

  // ---- multi-file combine + overrides (dozer-cli parity) ---------------

  /** `dozer`'s multi-config entry point
    * (reference dozer-cli/src/config_helper.rs:12-58 `combine_config` +
    * dozer-cli/src/cli/helper.rs:191-212 `apply_overrides`): glob-expand
    * each pattern, deep-merge `.yml`/`.yaml` trees (mappings merge
    * recursively, sequences concatenate, conflicting scalars are an
    * error), append `.sql` file contents to the `sql` key joined with
    * ';', then apply JSON-pointer overrides (`/sinks/0/path=...`) that
    * must address an existing node. At least one YAML file must match.
    */
  def fromPaths(patterns: Seq[String],
      overrides: Seq[(String, String)] = Nil): GraftConfig = {
    val merged = new java.util.LinkedHashMap[String, Object]()
    var yamlFound = false
    for (pattern <- patterns; path <- expandGlob(pattern)) {
      val name = path.toString
      val content = new String(java.nio.file.Files.readAllBytes(path))
      if (name.endsWith(".yml") || name.endsWith(".yaml")) {
        yamlFound = true
        val tree = parseRoot(content)
        if (tree != null) mergeInto(tree, merged, "/")
      } else if (name.endsWith(".sql")) {
        val sql = Option(merged.get("sql")) match {
          case Some(s: String) => s + ";" + content
          case Some(other) => fail(s"config key 'sql' is not a string: $other")
          case None => content
        }
        merged.put("sql", sql)
      } else fail(s"config file '$name' extension not supported (.yaml/.yml/.sql)")
    }
    if (!yamlFound) fail(s"no .yaml/.yml config matched ${patterns.mkString(", ")}")
    overrides.foreach { case (ptr, v) => applyOverride(merged, ptr, v) }
    val root = merged.asScala.toMap
    if (root.contains("connections")) fromDozer(root) else fromNative(root)
  }

  /** Glob expansion over the pattern's directory (supports `*`, `?`,
    * `[...]` in the file component and `**` across directories via
    * NIO's glob matcher); a literal path returns itself. Matches are
    * sorted so merge order is deterministic.
    */
  private def expandGlob(pattern: String): Seq[java.nio.file.Path] = {
    import java.nio.file.{FileSystems, Files, Paths}
    if (!pattern.exists("*?[".contains(_))) {
      val p = Paths.get(pattern)
      if (Files.exists(p)) Seq(p) else fail(s"config path not found: $pattern")
    } else {
      val norm = if (pattern.startsWith("./")) pattern.drop(2) else pattern
      val firstWild = norm.indexWhere("*?[".contains(_))
      val lastSep = norm.lastIndexOf('/', firstWild)
      val (baseStr, glob) =
        if (lastSep < 0) (".", norm)
        else (norm.substring(0, lastSep), norm.substring(lastSep + 1))
      val base = Paths.get(baseStr)
      if (!Files.isDirectory(base)) Seq.empty
      else {
        val matcher = FileSystems.getDefault.getPathMatcher("glob:" + glob)
        val walker =
          if (glob.contains("**")) Files.walk(base) else Files.list(base)
        try walker.iterator().asScala
          .filter(p => Files.isRegularFile(p) && matcher.matches(base.relativize(p)))
          .toSeq.sortBy(_.toString)
        finally walker.close()
      }
    }
  }

  /** Dozer merge_yaml semantics (config_helper.rs:101-139): mappings
    * deep-merge, sequences concatenate, anything else colliding is an
    * error (no silent scalar override).
    */
  private def mergeInto(from: java.util.Map[String, Object],
      to: java.util.Map[String, Object], at: String): Unit =
    from.asScala.foreach { case (k, v) =>
      to.get(k) match {
        case null if !to.containsKey(k) => to.put(k, v)
        case existing => (v, existing) match {
          case (fm: java.util.Map[_, _], tm: java.util.Map[_, _]) =>
            mergeInto(fm.asInstanceOf[java.util.Map[String, Object]],
              tm.asInstanceOf[java.util.Map[String, Object]], s"$at$k/")
          case (fs: java.util.List[_], ts: java.util.List[_]) =>
            ts.asInstanceOf[java.util.List[Object]]
              .addAll(fs.asInstanceOf[java.util.List[Object]])
          case _ =>
            fail(s"cannot merge config values at $at$k: '$v' onto '$existing'")
        }
      }
    }

  /** JSON-pointer override (RFC 6901 escapes; cli/helper.rs:197-203):
    * the pointer must address an existing node, whose value is replaced
    * with the YAML/JSON-parsed `value`.
    */
  private def applyOverride(root: java.util.Map[String, Object],
      pointer: String, value: String): Unit = {
    if (!pointer.startsWith("/")) fail(s"config override pointer must start with '/': $pointer")
    val segs = pointer.drop(1).split("/", -1).toSeq
      .map(_.replace("~1", "/").replace("~0", "~"))
    val yaml = new org.yaml.snakeyaml.Yaml(
      new org.yaml.snakeyaml.constructor.SafeConstructor(
        new org.yaml.snakeyaml.LoaderOptions()))
    val parsed = yaml.load[Object](value)
    def missing(): Nothing =
      fail(s"config override points at a missing node: $pointer")
    def set(node: Object, rest: Seq[String]): Unit = (node, rest) match {
      case (m: java.util.Map[_, _], Seq(last)) =>
        val mm = m.asInstanceOf[java.util.Map[String, Object]]
        if (!mm.containsKey(last)) missing()
        mm.put(last, parsed)
      case (l: java.util.List[_], Seq(last)) =>
        val ll = l.asInstanceOf[java.util.List[Object]]
        val i = last.toIntOption.getOrElse(missing())
        if (i < 0 || i >= ll.size) missing()
        ll.set(i, parsed)
      case (m: java.util.Map[_, _], head +: tail) =>
        val next = m.asInstanceOf[java.util.Map[String, Object]].get(head)
        if (next == null) missing()
        set(next, tail)
      case (l: java.util.List[_], head +: tail) =>
        val ll = l.asInstanceOf[java.util.List[Object]]
        val i = head.toIntOption.filter(i => i >= 0 && i < ll.size).getOrElse(missing())
        set(ll.get(i), tail)
      case _ => missing()
    }
    if (segs.isEmpty) missing() else set(root, segs)
  }

  // ---- graft-native shape ----------------------------------------------

  private def fromNative(root: Map[String, Object]): GraftConfig = {
    val sources = list(root, "sources").map { s =>
      SourceConf(
        name = str(s, "name"),
        path = str(s, "path"),
        format = s.asScala.get("format").map(_.toString).getOrElse("parquet"),
        schema = s.asScala.get("schema").map(x =>
          org.apache.spark.sql.types.StructType.fromDDL(x.toString)),
        watermark = s.asScala.get("watermark").map { w =>
          val m = asMap(w)
          (str(m, "column"), str(m, "delay"))
        },
        options = optMap(s, "options"),
        decode = s.asScala.get("decode").map(_.toString))
    }
    GraftConfig(
      sources = sources,
      sql = str(root, "sql"),
      sinks = sinks(root),
      streaming = root.get("streaming").exists(_.toString.toBoolean),
      udfs = udfs(root),
      metricsPort = root.get("metrics_port").map(_.toString.toInt)
        .orElse(metricsPort(root)),
      maintenance = maintenance(root))
  }

  /** `maintenance:` — lakehouse lifecycle tasks run after batch sinks:
    * {{{
    * maintenance:
    *   - path: /tables/events
    *     format: iceberg
    *     compact: true                 # or {small_file_bytes: N} to binpack
    *     expire_snapshots: {keep_last: 3}
    *   - path: /tables/dim
    *     format: delta
    *     compact: true                 # OPTIMIZE + DV purge
    *     checkpoint: true              # bound log replay
    *     cleanup_logs: true            # drop checkpoint-covered commits
    *     vacuum: true
    *     set_properties:               # ALTER TABLE SET TBLPROPERTIES
    *       delta.enableChangeDataFeed: "true"
    *       delta.constraints.positive: "v > 0"
    * }}}
    */
  private def maintenance(root: Map[String, Object]): Seq[GraftApp.MaintenanceConf] =
    root.get("maintenance").filter(_ != null).toSeq
      .flatMap(_.asInstanceOf[java.util.List[Object]].asScala.toSeq.map(asMap))
      .map { m =>
        val compactNode = m.asScala.get("compact").filter(_ != null)
        GraftApp.MaintenanceConf(
          path = str(m, "path"),
          format = str(m, "format"),
          compact = compactNode.isDefined &&
            !compactNode.contains(java.lang.Boolean.FALSE),
          compactSmallFileBytes = compactNode match {
            case Some(mm: java.util.Map[_, _]) =>
              asMap(mm).asScala.get("small_file_bytes")
                .map(_.toString.toLong).getOrElse(0L)
            case _ => 0L
          },
          expireKeepLast = m.asScala.get("expire_snapshots")
            .filter(_ != null).map { x =>
              val mm = asMap(x).asScala
              require(mm.contains("keep_last") ||
                  mm.contains("older_than_hours"),
                "maintenance expire_snapshots needs keep_last and/or " +
                  "older_than_hours")
              mm.get("keep_last").map(_.toString.toInt)
            }.flatten,
          expireOlderThanMillis = m.asScala.get("expire_snapshots")
            .filter(_ != null).flatMap(x =>
              asMap(x).asScala.get("older_than_hours")
                .map(h => h.toString.toLong * 3600L * 1000L)),
          vacuum = m.asScala.get("vacuum").filter(_ != null).exists {
            case mm: java.util.Map[_, _] => true
            case other => other.toString.toBoolean
          },
          vacuumRetainMillis = m.asScala.get("vacuum").collect {
            case mm: java.util.Map[_, _] =>
              asMap(mm).asScala.get("retain_hours")
                .map(h => h.toString.toLong * 3600L * 1000L)
          }.flatten,
          checkpoint = m.asScala.get("checkpoint")
            .exists(_.toString.toBoolean),
          cleanupLogs = m.asScala.get("cleanup_logs")
            .exists(_.toString.toBoolean),
          setProperties = m.asScala.get("set_properties")
            .filter(_ != null).map(x => asMap(x).asScala.map {
              case (k, v) => k.toString -> v.toString
            }.toMap).getOrElse(Map.empty),
          restoreVersion = m.asScala.get("restore").filter(_ != null)
            .flatMap(x => asMap(x).asScala.get("version"))
            .map(_.toString.toLong),
          restoreTimestamp = m.asScala.get("restore").filter(_ != null)
            .flatMap(x => asMap(x).asScala.get("timestamp_as_of"))
            .map(_.toString),
          rollbackToSnapshot = m.asScala.get("rollback_to_snapshot")
            .filter(_ != null).map(_.toString.toLong),
          createTag = refSpec(m, "create_tag"),
          createBranch = refSpec(m, "create_branch"),
          dropRef = m.asScala.get("drop_ref").filter(_ != null)
            .map(_.toString),
          cloneSource = m.asScala.get("clone").filter(_ != null)
            .map(x => asMap(x).asScala.getOrElse("source",
              fail("maintenance clone needs a source")).toString),
          cloneVersion = m.asScala.get("clone").filter(_ != null)
            .flatMap(x => asMap(x).asScala.get("version"))
            .map(_.toString.toLong),
          uniformSync = m.asScala.get("uniform_sync")
            .exists(_.toString.toBoolean),
          addFilesDir = m.asScala.get("add_files").filter(_ != null)
            .map(x => asMap(x).asScala.getOrElse("data_dir",
              fail("maintenance add_files needs a data_dir")).toString),
          convertToDelta = m.asScala.get("convert_to_delta")
            .exists(_.toString.toBoolean),
          removeOrphansOlderThanMillis =
            m.asScala.get("remove_orphan_files").filter(_ != null)
              .flatMap {
                case mm: java.util.Map[_, _] =>
                  Some(asMap(mm).asScala.get("older_than_hours")
                    .map(h => h.toString.toLong * 3600L * 1000L)
                    .getOrElse(72L * 3600 * 1000))
                case other =>
                  if (other.toString.toBoolean)
                    Some(72L * 3600 * 1000)
                  else None
              })
      }

  /** `create_tag: {name: x, snapshot_id: N?}` (snapshot_id optional —
    * the current snapshot when omitted).
    */
  private def refSpec(m: java.util.Map[String, Object],
      key: String): Option[(String, Option[Long])] =
    m.asScala.get(key).filter(_ != null).map { x =>
      val mm = asMap(x).asScala
      (mm.getOrElse("name", fail(s"maintenance $key needs a name"))
        .toString,
        mm.get("snapshot_id").map(_.toString.toLong))
    }

  /** `telemetry.metrics: !Prometheus{address: host:port}` (reference
    * dozer-types/src/models/telemetry.rs:39-56; the !Prometheus tag is
    * stripped by the loader like every dozer enum tag) → scrape port.
    */
  private def metricsPort(root: Map[String, Object]): Option[Int] =
    root.get("telemetry").map(asMap).flatMap(_.asScala.get("metrics"))
      .map(asMap).flatMap(_.asScala.get("address")).map { a =>
        val s = a.toString
        val i = s.lastIndexOf(':')
        if (i < 0) fail(s"telemetry metrics address '$s' has no port")
        s.substring(i + 1).toIntOption.getOrElse(
          fail(s"telemetry metrics address '$s' has a non-numeric port"))
      }

  // ---- dozer-compatible shape ------------------------------------------

  /** Webhook connection (`WebhookConfig`, ingestion_types.rs:560-588):
    * port + endpoints, each endpoint declaring its tables' row schemas
    * as the reference's inline JSON (`{"table": {"schema": {"fields":
    * [{name, typ, nullable}]}}}`, webhook/src/util.rs:16-29). Tables
    * land as push-channel sources the app decodes via
    * `WebhookServer.changes`; the channel is `<conn>_<path>`.
    */
  private case class WebhookConn(name: String, port: Int,
      endpoints: Map[String, String],               // path -> channel
      tables: Map[String, (String, org.apache.spark.sql.types.StructType)])

  /** gRPC ingest connection (`GrpcConfig`, ingestion_types.rs:65-76:
    * host/port/schemas/adapter) — a REAL gRPC-over-HTTP/2 ingest
    * service; `schemas` is the reference's inline JSON map (same
    * SourceSchema shape as webhook endpoints), `adapter` selects the
    * typed (`default`) or Arrow IPC (`arrow`) request decoding.
    */
  private case class GrpcConn(name: String, port: Int, adapter: String,
      tables: Map[String, (String, org.apache.spark.sql.types.StructType)])

  private def parseWebhookSchemas(json: String): Map[String, org.apache.spark.sql.types.StructType] = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val rootNode = mapper.readTree(json)
    val out = scala.collection.mutable.Map[String, StructType]()
    rootNode.fields().asScala.foreach { e =>
      val fieldsNode = Option(e.getValue.get("schema"))
        .map(_.get("fields")).getOrElse(e.getValue.get("fields"))
      if (fieldsNode == null)
        fail(s"webhook schema for table '${e.getKey}' has no fields")
      val fields = (0 until fieldsNode.size).map { i =>
        val f = fieldsNode.get(i)
        val typ = scala.util.Try(
          graft.types.FieldType.withName(f.get("typ").asText)).getOrElse(
          fail(s"webhook table '${e.getKey}': unknown typ '${f.get("typ").asText}'"))
        StructField(f.get("name").asText,
          graft.types.TypeMapping.toSpark(typ),
          nullable = Option(f.get("nullable")).forall(_.asBoolean(true)))
      }
      out(e.getKey) = StructType(fields)
    }
    out.toMap
  }

  private def fromDozer(root: Map[String, Object]): GraftConfig = {
    case class Conn(name: String, basePath: String,
        tables: Map[String, (String, String)], // table -> (subPath, ext)
        delta: Boolean = false,                // DeltaLake connection
        js: Boolean = false,                   // JavaScript connector (bootstrap_path)
        kafkaBroker: Option[String] = None,    // Kafka connection (native client)
        kafkaRegistry: Option[String] = None,  // + optional schema registry url
        kafkaExtra: Map[String, String] = Map.empty, // tls/truststore/...
        // connection shapes with no runnable-SOURCE mapping keep their
        // documented error here and fail only when a source references
        // them — a sink-only connection (Oracle sink) must still parse
        error: Option[String] = None)
    val rawConns = list(root, "connections").map { c =>
      val cm = c.asScala
      val name = str(c, "name")
      val cfg = asMap(cm.getOrElse("config",
        fail(s"connection '$name' has no config")))
      if (cfg.asScala.contains("endpoints")) {
        val port = cfg.asScala.get("port").map(_.toString.toInt).getOrElse(0)
        val eps = cfg.asScala("endpoints")
          .asInstanceOf[java.util.List[Object]].asScala.toSeq.map(asMap)
        var endpoints = Map[String, String]()
        var tables = Map[String, (String, org.apache.spark.sql.types.StructType)]()
        eps.foreach { ep =>
          val path = str(ep, "path")
          val chan = s"${name}_${path.stripPrefix("/").replace('/', '_')}"
          endpoints += (path -> chan)
          // schema: inline JSON string (tag-stripped !Inline) or a map
          // {Inline: json} / {Path: file}
          val schemaJson = ep.asScala.get("schema").map {
            case s: String => s
            case m: java.util.Map[_, _] =>
              val mm = m.asInstanceOf[java.util.Map[String, Object]].asScala
              mm.get("Inline").map(_.toString).getOrElse(
                mm.get("Path").map(p => new String(java.nio.file.Files
                  .readAllBytes(java.nio.file.Paths.get(p.toString))))
                  .getOrElse(fail(
                    s"webhook endpoint '$path': schema needs Inline or Path")))
            case other => fail(
              s"webhook endpoint '$path': unparseable schema $other")
          }.getOrElse(fail(s"webhook endpoint '$path' has no schema"))
          parseWebhookSchemas(schemaJson).foreach { case (t, st) =>
            if (!tables.contains(t)) tables += (t -> (chan, st))
          }
        }
        Right(Left(WebhookConn(name, port, endpoints, tables)))
      } else if (cfg.asScala.contains("schemas")) {
        // GrpcConfig (ingestion_types.rs:65-76); schemas: inline JSON
        // string (!Inline tag stripped) or {Inline: json}/{Path: file}
        val port = cfg.asScala.get("port").map(_.toString.toInt).getOrElse(0)
        val adapter = cfg.asScala.get("adapter").map(_.toString)
          .getOrElse("default")
        if (adapter != "default" && adapter != "arrow")
          fail(s"grpc connection '$name': adapter must be 'default' or " +
            s"'arrow' (got '$adapter') — grpc/src/connector.rs")
        val schemasJson = cfg.asScala("schemas") match {
          case s: String => s
          case m: java.util.Map[_, _] =>
            val mm = m.asInstanceOf[java.util.Map[String, Object]].asScala
            mm.get("Inline").map(_.toString).getOrElse(
              mm.get("Path").map(p => new String(java.nio.file.Files
                .readAllBytes(java.nio.file.Paths.get(p.toString))))
                .getOrElse(fail(
                  s"grpc connection '$name': schemas needs Inline or Path")))
          case other => fail(
            s"grpc connection '$name': unparseable schemas $other")
        }
        val tables = parseWebhookSchemas(schemasJson).map { case (t, st) =>
          t -> (s"${name}_$t", st)
        }
        Right(Right(GrpcConn(name, port, adapter, tables)))
      } else Left((name, cfg))
    }
    val webhookConns = rawConns.collect { case Right(Left(w)) => w }
    val grpcConns = rawConns.collect { case Right(Right(g)) => g }
    val conns = rawConns.collect { case Left((name, cfg)) =>
      cfg.asScala.get("details").map(asMap) match {
        case Some(details) =>
          val basePath = str(details, "path")
          val tables = cfg.asScala.get("tables").map(_.asInstanceOf[java.util.List[Object]].asScala.toSeq)
            .getOrElse(Nil).map { t =>
            val tm = asMap(t)
            val tname = str(tm, "name")
            val tcfg = tm.asScala.get("config").map(asMap)
            val sub = tcfg.flatMap(_.asScala.get("path")).map(_.toString).getOrElse("")
            val ext = tcfg.flatMap(_.asScala.get("extension")).map(_.toString).getOrElse(".parquet")
            tname -> (sub, ext)
          }.toMap
          Conn(name, basePath, tables)
        case None =>
          // DeltaLake shape (ingestion_types.rs:377-393): no `details`,
          // `tables` entries carry {path, name} directly. Maps to
          // format=delta sources; availability of the connector jar is
          // probed at build/run time, not here.
          val dtabs = cfg.asScala.get("tables")
            .map(_.asInstanceOf[java.util.List[Object]].asScala.toSeq)
            .getOrElse(Nil).flatMap { t =>
              val tm = asMap(t).asScala
              (tm.get("path"), tm.get("name")) match {
                case (Some(p), Some(n)) => Some(n.toString -> (p.toString, ""))
                case _                  => None
              }
            }.toMap
          if (dtabs.nonEmpty) Conn(name, "", dtabs, delta = true)
          // JavaScript connector (ingestion_types.rs:549-556
          // JavaScriptConfig { bootstrap_path }): the script runs on the
          // embedded JsMini runtime; its table is always `json_records`
          else if (cfg.asScala.contains("bootstrap_path"))
            Conn(name, cfg.asScala("bootstrap_path").toString,
              Map("json_records" -> ("", ".js")), js = true)
          // Kafka connection (KafkaConfig { broker, schema_registry_url },
          // ingestion_types.rs:173-177): runnable through the NATIVE
          // consumer session client — each source's table_name is its
          // topic; without a registry the table is the reference's fixed
          // (key, message) shape (no_schema_registry_basic.rs), with one
          // it is the Connect-JSON in-band-schema typed decode
          else if (cfg.asScala.contains("broker"))
            Conn(name, "", Map.empty,
              kafkaBroker = Some(cfg.asScala("broker").toString),
              kafkaRegistry = cfg.asScala.get("schema_registry_url")
                .filter(v => v != null && v.toString.nonEmpty)
                .map(_.toString),
              // transport/security passthrough (round-9 SSL surface):
              // snake-case config keys → native-source option names
              kafkaExtra = Seq(
                "tls" -> "tls",
                "truststore" -> "truststore",
                "truststore_password" -> "truststorePassword",
                "value_format" -> "valueFormat",
                "starting_offsets" -> "startingOffsets",
                "starting_timestamp" -> "startingTimestamp",
                "sasl" -> "sasl",
                "sasl_username" -> "saslUsername",
                "sasl_password" -> "saslPassword",
                "isolation_level" -> "isolationLevel").flatMap { case (yk, ok) =>
                  cfg.asScala.get(yk).filter(_ != null)
                    .map(v => ok -> v.toString)
                }.toMap)
          else if (cfg.asScala.contains("provider") ||
              cfg.asScala.contains("wss_url"))
            Conn(name, "", Map.empty, error = Some(
              s"connection '$name': Ethereum subscriptions need a web3 " +
                "transport — decode the eth_getLogs/callTracer wire with " +
                "cdc.EthLogs over a Kafka topic, file drop " +
                "(Sources.ethLogFileStream) or webhook push; " +
                "Sources.ethereumOptions carries the subscription config " +
                "(SURVEY §2.1)"))
          else Conn(name, "", Map.empty, error = Some(
            s"connection '$name': only object-store (LocalStorage/S3), " +
              "DeltaLake, and Webhook connections map to runnable " +
              "sources here; Postgres/MySQL CDC, Kafka, Snowflake, " +
              "MongoDB, and Ethereum are config-level mappings " +
              "documented in SURVEY §2.1"))
      }
    }
    val connByName = conns.map(c => c.name -> c).toMap
    val webhookByName = webhookConns.map(w => w.name -> w).toMap
    val grpcByName = grpcConns.map(g => g.name -> g).toMap
    val sources = list(root, "sources").map { s =>
      val sname = str(s, "name")
      val connName = str(s, "connection")
      val tableName = str(s, "table_name")
      webhookByName.get(connName) match { case Some(w) =>
        val (chan, schema) = w.tables.getOrElse(tableName,
          fail(s"source '$sname': webhook connection '$connName' declares " +
            s"no table '$tableName' (has ${w.tables.keys.mkString(", ")})"))
        SourceConf(name = sname, path = "",
          format = "graft.sources.PushSource", schema = Some(schema),
          options = Map("channel" -> chan), decode = Some("webhook"))
      case None => grpcByName.get(connName) match { case Some(g) =>
        val (chan, schema) = g.tables.getOrElse(tableName,
          fail(s"source '$sname': grpc connection '$connName' declares " +
            s"no schema '$tableName' (has ${g.tables.keys.mkString(", ")})"))
        SourceConf(name = sname, path = "",
          format = "graft.sources.PushSource", schema = Some(schema),
          options = Map("channel" -> chan, "schema_name" -> tableName),
          decode = Some(if (g.adapter == "arrow") "arrow" else "grpc"))
      case None =>
      val conn = connByName.getOrElse(connName,
        fail(s"source '$sname' references unknown connection '$connName'"))
      conn.error.foreach(fail)
      if (conn.delta) {
        val (tpath, _) = conn.tables.getOrElse(tableName,
          fail(s"source '$sname': DeltaLake connection '$connName' has " +
            s"no table '$tableName'"))
        SourceConf(name = sname, path = tpath, format = "delta")
      } else if (conn.kafkaBroker.isDefined) {
        SourceConf(name = sname, path = "",
          format = "graft.sources.KafkaNativeSource",
          options = Map(
            "broker" -> conn.kafkaBroker.get,
            "topic" -> tableName) ++
            conn.kafkaRegistry.map("schema_registry_url" -> _) ++
            conn.kafkaExtra,
          decode = Some(
            if (conn.kafkaRegistry.isDefined) "kafka_connect"
            else "kafka_plain"))
      } else if (conn.js) {
        if (tableName != "json_records")
          fail(s"source '$sname': JavaScript connection '$connName' " +
            s"exposes one table, 'json_records' (got '$tableName') — " +
            "dozer-ingestion/javascript/src/lib.rs:38-44")
        SourceConf(name = sname, path = conn.basePath, format = "",
          decode = Some("javascript"))
      } else {
        val (sub, ext) = conn.tables.getOrElse(tableName, ("", ".parquet"))
        val dir = Seq(conn.basePath, sub).filter(_.nonEmpty).mkString("/")
        // a file named <table><ext> under the prefix wins; otherwise the
        // prefix is the table's folder (dozer's object-store scan shape)
        val candidate = s"$dir/$tableName$ext"
        val path =
          if (java.nio.file.Files.exists(java.nio.file.Paths.get(candidate))) candidate
          else dir
        SourceConf(name = sname, path = path,
          format = if (ext.contains("csv")) "csv" else "parquet")
      }
      }
      }
    }
    GraftConfig(
      sources = sources,
      sql = str(root, "sql"),
      sinks = sinks(root),
      streaming = root.get("streaming").exists(_.toString.toBoolean),
      udfs = udfs(root),
      webhooks = webhookConns.map(w => GraftApp.WebhookConf(w.port, w.endpoints)),
      grpcServers = grpcConns.map(g => GraftApp.GrpcServerConf(g.port,
        g.tables.map { case (t, (chan, st)) =>
          t -> graft.sources.GrpcIngest.TableSpec(st, chan)
        })),
      metricsPort = metricsPort(root))
  }

  // ---- shared ----------------------------------------------------------

  /** `udfs:` — SQL-expression UDFs register as Spark SQL scalar
    * functions; ONNX model UDFs (udf_config.rs `UdfType::Onnx { path }`,
    * YAML `config: !Onnx path: …` — the tag is stripped by the loader,
    * so the type is inferred from the `path` field, same convention as
    * the dozer sink tags) load through [[graft.functions.OnnxMini]];
    * JavaScript module UDFs (`config: !JavaScript module: …`) load
    * through the ES-subset interpreter ([[graft.functions.JsUdf]]).
    */
  private def udfs(root: Map[String, Object]): Seq[GraftApp.UdfConf] =
    root.get("udfs").filter(_ != null) // `udfs:` with no entries → null
      .map(_.asInstanceOf[java.util.List[Object]]
        .asScala.toSeq.map(asMap)).getOrElse(Nil).map { u =>
      val name = str(u, "name")
      val m = u.asScala
      (m.get("expression"),
        m.get("config").map(asMap).map(_.asScala)) match {
        case (Some(e), _) =>
          GraftApp.UdfConf(
            name = name,
            params = m.get("params").map(_.toString).getOrElse(""),
            returns = m.get("returns").map(_.toString).getOrElse("DOUBLE"),
            expression = e.toString)
        case (None, Some(c)) if c.contains("path") =>
          GraftApp.UdfConf(name = name, params = "", returns = "DOUBLE",
            expression = "", onnxPath = Some(c("path").toString))
        case (None, Some(c)) if c.contains("module") =>
          // UdfType::JavaScript { module } (udf_config.rs:28-33) — the
          // !JavaScript tag is stripped by the loader, so the type is
          // inferred from the `module` field, same convention as !Onnx
          GraftApp.UdfConf(name = name, params = "", returns = "STRING",
            expression = "", jsModule = Some(c("module").toString))
        case (None, c) =>
          val kind = c.flatMap(_.keys.headOption).getOrElse("model-file")
          fail(s"udf '$name' ($kind): expected a SQL `expression`, an ONNX " +
            "`config` with a `path`, or a JavaScript `config` with a `module`")
      }
    }

  private def sinks(root: Map[String, Object]): Seq[SinkConf] =
    list(root, "sinks").map { s =>
      val m = s.asScala
      if (m.contains("config")) {
        // dozer Sink { name, config: !Dummy/!Clickhouse/!Oracle/!Aerospike }
        // (reference dozer-types/src/models/sink.rs:99-123) — the tag is
        // stripped, so the sink type is inferred from its fields.
        dozerSink(root, m.get("name").map(_.toString).getOrElse("<unnamed>"),
          asMap(m("config")).asScala)
      } else {
      val mode = m.get("mode").map(_.toString).getOrElse("append")
      SinkConf(
        table = m.get("table").orElse(m.get("table_name")).map(_.toString)
          .getOrElse(fail("sink needs table/table_name")),
        // dozer sinks name managed endpoints; ours need a target path
        // (except dummy, which consumes without writing, and jdbc,
        // which targets options.url/dbtable)
        path = m.get("path").map(_.toString).getOrElse {
          if (mode == "dummy" || mode == "jdbc") ""
          else fail("sink needs a path (graft sinks are object-store)")
        },
        mode = mode,
        keys = strList(m, "keys"),
        checkpoint = m.get("checkpoint").map(_.toString),
        buckets = m.get("buckets").filter(_ != null).map { b =>
          val n = try b.toString.toInt catch {
            case _: NumberFormatException =>
              fail(s"sink buckets must be an integer, got '$b'")
          }
          if (n <= 0) fail(s"sink buckets must be positive, got $n")
          n
        },
        partitionBy = strList(m, "partition_by"),
        format = m.get("format").map(_.toString).getOrElse("parquet"),
        options = optMap(s, "options"),
        zorderBy = strList(m, "zorder_by"))
      }
    }

  /** Map a dozer sink config (tag stripped) onto the Spark-side sink
    * surface. Type inference by fields, mirroring the reference enum
    * (sink.rs:107-112):
    *  - Clickhouse {host, port, database, source_table_name,
    *    sink_table_name, create_table_options.primary_keys} → the JDBC
    *    merge sink (ClickHouse speaks JDBC; ReplacingMergeTree's
    *    replace-by-key IS the keyed merge);
    *  - Oracle {connection, table_name, unique_key, owner} → the JDBC
    *    merge sink against the named connection's OracleConfig
    *    (ingestion_types.rs OracleConfig: user/password/host/port/sid);
    *  - Dummy {table_name} → consume + count, write nothing;
    *  - Aerospike → no Spark analogue, documented error.
    * The JDBC driver jar is probed at build/run, not config parse.
    */
  private def dozerSink(root: Map[String, Object], name: String,
      cfg: scala.collection.Map[String, Object]): SinkConf = {
    def s(k: String) = cfg.get(k).filter(_ != null).map(_.toString)
    if (cfg.contains("metadata_namespace"))
      fail(s"sink '$name': the Aerospike sink has no Spark-level analogue " +
        "in this build — use a JDBC or object-store sink (SURVEY §2.2)")
    else if (cfg.contains("source_table_name") || cfg.contains("sink_table_name")) {
      val host = s("host").getOrElse("0.0.0.0")
      val port = s("port").getOrElse("9000")
      val db = s("database").getOrElse("default")
      val keys = cfg.get("create_table_options").filter(_ != null)
        .map(o => asMap(o).asScala)
        .flatMap(_.get("primary_keys")).filter(_ != null).map {
          case l: java.util.List[_] => l.asScala.map(_.toString).toSeq
          case x => Seq(x.toString)
        }.getOrElse(Nil)
      val src = s("source_table_name")
        .getOrElse(fail(s"sink '$name' needs source_table_name"))
      SinkConf(
        table = src, path = "", mode = "jdbc", keys = keys,
        options = Map(
          "url" -> s"jdbc:clickhouse://$host:$port/$db",
          "dbtable" -> s("sink_table_name").getOrElse(src),
          "driver" -> "com.clickhouse.jdbc.ClickHouseDriver") ++
          s("user").map("user" -> _) ++ s("password").map("password" -> _))
    } else if (cfg.contains("connection")) {
      val connName = s("connection").get
      val conn = list(root, "connections")
        .find(c => c.asScala.get("name").exists(_.toString == connName))
        .getOrElse(fail(s"sink '$name': connection '$connName' not found"))
      val cc = asMap(conn.asScala.getOrElse("config",
        fail(s"sink '$name': connection '$connName' has no config"))).asScala
      def c(k: String) = cc.get(k).filter(_ != null).map(_.toString)
      val host = c("host").getOrElse(fail(s"connection '$connName' needs host"))
      val port = c("port").getOrElse("1521")
      val sid = c("sid").getOrElse(fail(s"connection '$connName' needs sid"))
      val tbl = s("table_name").getOrElse(fail(s"sink '$name' needs table_name"))
      SinkConf(
        table = tbl, path = "", mode = "jdbc", keys = strList(cfg, "unique_key"),
        options = Map(
          "url" -> s"jdbc:oracle:thin:@//$host:$port/$sid",
          "dbtable" -> s("owner").map(o => s"$o.$tbl").getOrElse(tbl),
          "driver" -> "oracle.jdbc.OracleDriver") ++
          c("user").map("user" -> _) ++ c("password").map("password" -> _))
    } else if (cfg.contains("table_name")) {
      SinkConf(table = s("table_name").get, path = "", mode = "dummy")
    } else fail(s"sink '$name': unrecognized dozer sink config " +
      s"(fields: ${cfg.keys.mkString(", ")})")
  }

  /** String-list sink field; a bare scalar (`keys: id`) is accepted as a
    * one-element list rather than dying in a ClassCastException.
    */
  private def strList(m: scala.collection.Map[String, Object],
      key: String): Seq[String] =
    m.get(key).filter(_ != null).map {
      case l: java.util.List[_] => l.asScala.map(_.toString).toSeq
      case scalar => Seq(scalar.toString)
    }.getOrElse(Nil)

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(msg)

  private def list(root: Map[String, Object], key: String): Seq[java.util.Map[String, Object]] =
    root.get(key).filter(_ != null) // empty section parses to null
      .map(_.asInstanceOf[java.util.List[Object]].asScala.toSeq.map(asMap))
      .getOrElse(fail(s"config missing '$key'"))

  private def asMap(o: Any): java.util.Map[String, Object] =
    o.asInstanceOf[java.util.Map[String, Object]]

  /** Optional string→string map field (`options:` reader/writer
    * passthrough); absent or null → empty.
    */
  private def optMap(m: java.util.Map[String, Object],
      key: String): Map[String, String] =
    Option(m.get(key)).map(asMap(_).asScala.map {
      case (k, v) => k -> (if (v == null) "" else v.toString)
    }.toMap).getOrElse(Map.empty)

  private def str(m: java.util.Map[String, Object], key: String): String =
    Option(m.get(key)).map(_.toString.trim)
      .getOrElse(fail(s"missing '$key' in ${m.keySet()}"))

  private def str(m: Map[String, Object], key: String): String =
    m.get(key).map(_.toString.trim).getOrElse(fail(s"missing '$key'"))
}
