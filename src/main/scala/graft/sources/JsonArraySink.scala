package graft.sources

import java.io.BufferedWriter
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.core.util.{DefaultIndenter, DefaultPrettyPrinter}
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.DataFrame

/** S5 array-shape JSON sink — the reference's ETL writes ONE indented
  * JSON *array* file (`/root/reference/process_etl.py:14-17`:
  * `json.dump(df.to_dict(orient='records'), f, indent=4)`), not JSON
  * lines.
  *
  * A single array file is inherently a driver-side boundary artifact —
  * it cannot be split, appended, or written in parallel — so this sink
  * is for API-sized exports, NOT a data-lake format (that's the
  * JSON-lines / parquet writers). Scale posture: rows stream through
  * `toJSON.toLocalIterator` (one partition resident at a time, never
  * the whole result), and `maxRows` hard-fails the export instead of
  * silently producing a multi-GB unsplittable file. Round-trip is
  * covered by the S4 reader: `spark.read.option("multiLine", true)`
  * over the output yields the original rows.
  */
object JsonArraySink {

  /** Write `df` as one indented JSON array; returns rows written.
    * Fails (and removes the partial file) past `maxRows`.
    */
  def write(df: DataFrame, path: String, indent: Int = 4,
            maxRows: Long = 1000000L): Long = {
    val target = Paths.get(path)
    if (target.getParent != null) Files.createDirectories(target.getParent)
    val mapper = new ObjectMapper()
    val pad = " " * indent
    val printer = new DefaultPrettyPrinter()
      .withObjectIndenter(new DefaultIndenter(pad, "\n"))
    val writer = mapper.writer(printer)
    val out: BufferedWriter =
      Files.newBufferedWriter(target, StandardCharsets.UTF_8)
    var n = 0L
    try {
      out.write("[")
      val it = df.toJSON.toLocalIterator()
      while (it.hasNext) {
        val line = it.next()
        if (n >= maxRows)
          throw new IllegalStateException(
            s"JsonArraySink: result exceeds maxRows=$maxRows; " +
              "an unsplittable single-file array export at this size is " +
              "almost certainly a mistake — use a JSON-lines or parquet sink")
        if (n > 0L) out.write(",")
        out.write("\n")
        // re-indent the pretty element one level so it nests in the array
        val pretty = writer.writeValueAsString(mapper.readTree(line))
        out.write(pad)
        out.write(pretty.replace("\n", "\n" + pad))
        n += 1L
      }
      out.write("\n]")
      out.close()
      n
    } catch {
      case e: Throwable =>
        out.close()
        Files.deleteIfExists(target)
        throw e
    }
  }
}
