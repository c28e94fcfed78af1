package graft.workflow

import org.apache.spark.sql.DataFrame

/** Training summary (reference ModelInsights.scala, 858 LoC): a
  * driver-side JSON report assembled from artifacts the pipeline already
  * computed — the fitted DAG's stages and outputs, model-selection
  * validation results, and data-quality statistics rows. Nothing here
  * runs Spark jobs beyond collecting the (small) stats frames passed in.
  */
object ModelInsights {

  private def esc(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def jNum(d: Double): String =
    if (d.isNaN || d.isInfinite) "null" else d.toString

  /** JSON summary: per-layer stage names + outputs, selector validation
    * metrics (if any), and data-quality stats rows (if given, e.g.
    * DataQuality.sanityCheckStats output). */
  def summarize(model: WorkflowModel,
                selector: Option[ModelSelector.ModelSelectorStage] = None,
                sanityStats: Option[DataFrame] = None): String = {
    val layers = model.layers.zipWithIndex.map { case (layer, i) =>
      val stages = layer.map { st =>
        s"""{"name": ${esc(st.name)}, "outputs": [${
          st.outputFeatures.map(f => esc(f.name)).mkString(", ")}]}"""
      }
      s"""{"layer": $i, "stages": [${stages.mkString(", ")}]}"""
    }
    val sel = selector.map { s =>
      val rows = s.results.map(r =>
        s"""{"model": ${esc(r.name)}, "metric": ${jNum(r.metric)}}""")
      s""""modelSelection": {"best": ${esc(Option(s.bestName).getOrElse(""))}, "validated": [${rows.mkString(", ")}]}"""
    }
    val sanity = sanityStats.map { df =>
      val cols = df.columns
      val rows = df.collect().map { r =>
        val fields = cols.zipWithIndex.map { case (c, i) =>
          val v = r.get(i) match {
            case null => "null"
            case d: Double => jNum(d)
            case b: Boolean => b.toString
            case n: Number => n.toString
            case other => esc(other.toString)
          }
          s"${esc(c)}: $v"
        }
        s"{${fields.mkString(", ")}}"
      }
      s""""sanityCheck": [${rows.mkString(", ")}]"""
    }
    val parts = Seq(
      Some(s""""resultFeatures": [${model.resultFeatures.map(f => esc(f.name)).mkString(", ")}]"""),
      Some(s""""layers": [${layers.mkString(", ")}]"""),
      sel, sanity).flatten
    s"{${parts.mkString(", ")}}"
  }
}
