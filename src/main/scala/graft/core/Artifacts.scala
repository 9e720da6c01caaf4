package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** dbt-artifact parity for the DAG runner (SURVEY §3: `dbt run` emits
  * `target/manifest.json` at compile time and `target/run_results.json`
  * after execution — reference logs/dbt.log:398-404). Tooling that watches
  * a dbt project reads exactly these two files, so the engine writes the
  * same shapes: a node graph with dependency edges, and per-node
  * status/rows/timing. JSON is rendered by hand — tiny, dependency-free,
  * driver-side only.
  */
object Artifacts {

  final case class NodeResult(name: String, status: String, rows: Long,
      seconds: Double, error: Option[String])

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** The DAG as a manifest: every registered model with its dependency
    * edges, in topological order (the reference's graph_summary is the
    * same information).
    */
  def manifestJson(reg: ModelRegistry): String = {
    val nodes = reg.topoOrder.map { m =>
      val deps = m.deps.map(d => "\"" + esc(d) + "\"").mkString("[", ",", "]")
      s"""    {"name": "${esc(m.name)}", "depends_on": $deps}"""
    }
    "{\n  \"nodes\": [\n" + nodes.mkString(",\n") + "\n  ]\n}\n"
  }

  // Locale.ROOT: the default locale may format decimals with a comma,
  // which would make the emitted JSON unparseable
  private def sec(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  def runResultsJson(results: Seq[NodeResult]): String = {
    val rs = results.map { r =>
      val err = r.error.map(e => s""", "message": "${esc(e)}"""").getOrElse("")
      s"""    {"name": "${esc(r.name)}", "status": "${r.status}", "rows": ${r.rows}, "execution_time": ${sec(r.seconds)}$err}"""
    }
    val elapsed = results.map(_.seconds).sum
    s"""{\n  "elapsed_time": ${sec(elapsed)},\n  "results": [\n""" +
      rs.mkString(",\n") + "\n  ]\n}\n"
  }

  /** Materialize the DAG like [[ModelRegistry.runAll]] but record per-model
    * status/rows/wall-clock, continuing past failures the way `dbt run`
    * does (a failed node marks itself `error` and its transitive dependents
    * `skipped`; independent subtrees still build). The resolve/materialize
    * loop intentionally mirrors `runAll` — keep the two in step when the
    * write path changes (they differ only in failure semantics: `runAll`
    * throws, this continues).
    */
  def runWithResults(reg: ModelRegistry, spark: SparkSession,
      sources: Map[String, DataFrame], writer: graft.sources.TableWriter,
      partitioning: Map[String, Seq[String]] = Map.empty,
      incremental: Set[String] = Set.empty)
      : (Map[String, DataFrame], Seq[NodeResult]) = {
    val built = scala.collection.mutable.Map[String, DataFrame](sources.toSeq: _*)
    val failed = scala.collection.mutable.Set.empty[String]
    val results = scala.collection.mutable.ArrayBuffer.empty[NodeResult]
    reg.topoOrder.foreach { m =>
      if (m.deps.exists(failed)) {
        failed += m.name
        results += NodeResult(m.name, "skipped", 0L, 0.0, None)
      } else {
        val t0 = System.nanoTime()
        try {
          val in = m.deps.map { d =>
            d -> built.getOrElse(d, throw new IllegalArgumentException(
              s"model ${m.name}: unresolved dep $d"))
          }.toMap
          val out = m.transform(spark, in)
          ModelRegistry.writeModel(writer, m.name, out, partitioning,
            incremental)
          val back = writer.read(spark, m.name)
          built(m.name) = back
          results += NodeResult(m.name, "success", back.count(),
            (System.nanoTime() - t0) / 1e9, None)
        } catch {
          case e: Exception =>
            failed += m.name
            results += NodeResult(m.name, "error", 0L,
              (System.nanoTime() - t0) / 1e9,
              Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
        }
      }
    }
    (built.toMap, results.toSeq)
  }

  def writeTargetDir(dir: String, reg: ModelRegistry,
      results: Seq[NodeResult]): Unit = {
    val p = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(p)
    java.nio.file.Files.write(p.resolve("manifest.json"),
      manifestJson(reg).getBytes("UTF-8"))
    java.nio.file.Files.write(p.resolve("run_results.json"),
      runResultsJson(results).getBytes("UTF-8"))
  }
}
