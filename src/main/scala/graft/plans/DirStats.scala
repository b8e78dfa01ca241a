package graft.plans

import scala.language.existentials

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._

/** Per-data-dir column statistics for the manifest snapshot store —
  * the piece that makes [[Snapshots.deleteWhere]]'s file skip a
  * METADATA decision, the way Iceberg's manifests carry per-file
  * min/max/null counts and its InclusiveMetricsEvaluator prunes files
  * before any scan (re-derived here from the published semantics; the
  * reference platform's partition/metadata pruning surface is
  * `/root/reference/README.md:236-268`).
  *
  * Stats are harvested from the parquet FOOTERS the write already
  * produced — a driver-side metadata read per file, no Spark job, no
  * extra data pass — and stored as `_graft_stats.json` INSIDE the data
  * dir (underscore-prefixed ⇒ invisible to Spark's parquet reader;
  * lives and dies with the dir, so GC and orphan cleanup need no new
  * rules). Collection is best-effort: a dir with no sidecar simply
  * never prunes (the evaluator's conservative default).
  *
  * Only top-level primitive columns with footer stats are recorded
  * (INT32/INT64/FLOAT/DOUBLE/BOOLEAN, and BINARY with a UTF8
  * annotation); anything else — nested paths, INT96, unannotated
  * binary, or files whose writer suppressed stats — leaves the column
  * absent, which the evaluator treats as unknowable. */
object DirStats {

  val FileName = "_graft_stats.json"

  /** min/max are normalized to Long / Double / String / Boolean;
    * `nulls` is -1 when any footer left the null count unset. */
  final case class ColStats(min: Any, max: Any, nulls: Long)
  final case class Stats(rows: Long, cols: Map[String, ColStats])

  // ---- collection from footers ---------------------------------------

  /** One column chunk's harvested stats: `mm` = (min, max, nulls) when
    * the footer carried usable values; `allNullNulls` = the null count
    * of an all-null chunk (no min/max, but still summable). Both empty
    * = unusable, which kills the column for the whole dir. */
  private final case class Chunk(name: String, mm: Option[(Any, Any, Long)],
    allNullNulls: Option[Long])

  def collect(dir: java.io.File): Option[Stats] = scala.util.Try {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import scala.collection.parallel.CollectionConverters._
    // sorted for a deterministic merge order (listFiles order is
    // filesystem-dependent, and the all-null-first rule below is
    // order-sensitive)
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    val conf = new org.apache.hadoop.conf.Configuration()
    // footer READS run in parallel (pure I/O, one open per file — the
    // cost that scales with file count); the order-sensitive merge
    // below stays sequential over the same sorted order (.par.map
    // preserves element order)
    val extracted: Seq[(Long, Seq[Chunk])] = files.par.map { f =>
      val r = ParquetFileReader.open(
        HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(f.getPath), conf))
      try {
        val chunks = scala.collection.mutable.ArrayBuffer.empty[Chunk]
        r.getFooter.getBlocks.forEach { blk =>
          blk.getColumns.forEach { cc =>
            val path = cc.getPath.toArray
            if (path.length == 1) {
              val name = path(0)
              val pt = cc.getPrimitiveType
              val st = cc.getStatistics
              val isUtf8 = pt.getLogicalTypeAnnotation ==
                LogicalTypeAnnotation.stringType()
              def norm(v: Any): Option[Any] = pt.getPrimitiveTypeName match {
                case INT32 => Some(v.asInstanceOf[java.lang.Integer].longValue())
                case INT64 =>
                  val l = v.asInstanceOf[java.lang.Long].longValue()
                  pt.getLogicalTypeAnnotation match {
                    // Timestamp stats carry the FILE's unit; Catalyst
                    // timestamp literals are MICROS since epoch. The
                    // testdata has shipped as both TIMESTAMP(MICROS)
                    // and TIMESTAMP(NANOS) across generations (see the
                    // loadEvents gotcha), so normalize to micros here —
                    // comparing nanos stats against a micros literal
                    // would mis-prune by 1000×. The nanos floor-divide
                    // stays inclusive-sound: micro-integral literals
                    // can't land inside the dropped sub-micro fraction.
                    case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
                      ts.getUnit match {
                        case LogicalTypeAnnotation.TimeUnit.MILLIS =>
                          Some(l * 1000L)
                        case LogicalTypeAnnotation.TimeUnit.MICROS => Some(l)
                        case LogicalTypeAnnotation.TimeUnit.NANOS =>
                          Some(Math.floorDiv(l, 1000L))
                        case _ => None
                      }
                    case _ => Some(l)
                  }
                case FLOAT => Some(v.asInstanceOf[java.lang.Float].doubleValue())
                case DOUBLE => Some(v.asInstanceOf[java.lang.Double].doubleValue())
                case BOOLEAN => Some(v.asInstanceOf[java.lang.Boolean].booleanValue())
                case BINARY if isUtf8 => Some(
                  v.asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8)
                case _ => None
              }
              val mm = for {
                s <- Option(st) if s.hasNonNullValue
                mn <- norm(s.genericGetMin); mx <- norm(s.genericGetMax)
              } yield (mn, mx, if (s.isNumNullsSet) s.getNumNulls else -1L)
              val allNullNulls = Option(st)
                .filter(s => !s.hasNonNullValue && s.isNumNullsSet)
                .map(_.getNumNulls)
              chunks += Chunk(name, mm, allNullNulls)
            }
          }
        }
        (r.getRecordCount, chunks.toSeq)
      } finally r.close()
    }.seq.toSeq
    // name -> (min, max, nulls); dropped from the map = unknowable
    val acc = scala.collection.mutable.LinkedHashMap.empty[String, ColStats]
    val dead = scala.collection.mutable.Set.empty[String]
    var rows = 0L
    extracted.foreach { case (fileRows, chunks) =>
      rows += fileRows
      chunks.foreach { case Chunk(name, mm, allNullNulls) =>
        mm.filter(_ => !dead.contains(name)) match {
          case None =>
            // this chunk has no usable stats — an all-null chunk
            // (no non-null value, but null-counted) is still
            // summable if the column is ALREADY known; any other
            // no-stats shape (including all-null-first, whose
            // null count we'd otherwise lose) kills the column
            allNullNulls match {
              case Some(nu) if acc.contains(name) =>
                val p = acc(name)
                acc(name) = p.copy(nulls =
                  if (p.nulls < 0) -1 else p.nulls + nu)
              case _ => dead += name; acc.remove(name)
            }
          case Some((mn, mx, nu)) => acc.get(name) match {
            case None if !dead.contains(name) =>
              acc(name) = ColStats(mn, mx, nu)
            case Some(p) =>
              acc(name) = ColStats(
                if (cmp(mn, p.min).exists(_ < 0)) mn else p.min,
                if (cmp(mx, p.max).exists(_ > 0)) mx else p.max,
                if (p.nulls < 0 || nu < 0) -1 else p.nulls + nu)
            case _ => ()
          }
        }
      }
    }
    Stats(rows, acc.toMap)
  }.toOption

  /** Collect from footers and persist the sidecar; best-effort. */
  def writeFor(dir: java.io.File): Unit =
    collect(dir).foreach { st =>
      import graft.core.Jsonish.jstr
      def jval(v: Any): String = v match {
        case s: String => jstr(s)
        case b: Boolean => b.toString
        case d: Double => // JSON-safe: NaN/Inf aren't JSON literals
          if (d.isNaN || d.isInfinite) jstr(d.toString) else d.toString
        case l: Long => l.toString
        case other => jstr(other.toString)
      }
      def tag(v: Any): String = v match {
        case _: String => "s"; case _: Boolean => "b"
        case _: Double => "d"; case _ => "l"
      }
      val cols = st.cols.map { case (n, c) =>
        s"${jstr(n)}:{" +
          s""""t":${jstr(tag(c.min))},"min":${jval(c.min)},""" +
          s""""max":${jval(c.max)},"nulls":${c.nulls}}"""
      }.mkString("{", ",", "}")
      java.nio.file.Files.writeString(
        new java.io.File(dir, FileName).toPath,
        s"""{"rows":${st.rows},"cols":$cols}""")
    }

  def read(dir: java.io.File): Option[Stats] = scala.util.Try {
    val f = new java.io.File(dir, FileName)
    if (!f.exists()) None
    else {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = om.readTree(java.nio.file.Files.readString(f.toPath))
      val cols = scala.collection.mutable.LinkedHashMap.empty[String, ColStats]
      val it = root.get("cols").properties().iterator()
      while (it.hasNext) {
        val e = it.next(); val c = e.getValue
        def v(k: String): Any = c.get("t").asText() match {
          case "s" => c.get(k).asText()
          case "b" => c.get(k).asBoolean()
          case "d" => if (c.get(k).isTextual) c.get(k).asText().toDouble
                      else c.get(k).asDouble()
          case _ => c.get(k).asLong()
        }
        cols(e.getKey) = ColStats(v("min"), v("max"), c.get("nulls").asLong())
      }
      Some(Stats(root.get("rows").asLong(), cols.toMap))
    }
  }.toOption.flatten

  // ---- inclusive metrics evaluation ----------------------------------

  /** Total order between a literal (Catalyst-internal value) and a
    * normalized stats value; None when incomparable — callers must
    * treat None as "unknown ⇒ may match". */
  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: Number, y: Number) =>
      Some(BigDecimal(x.toString).compare(BigDecimal(y.toString)))
    case (x: Boolean, y: Boolean) => Some(x.compareTo(y))
    case (x, y) =>
      val sx = x match {
        case u: org.apache.spark.unsafe.types.UTF8String => Some(u.toString)
        case s: String => Some(s); case _ => None
      }
      val sy = y match {
        case u: org.apache.spark.unsafe.types.UTF8String => Some(u.toString)
        case s: String => Some(s); case _ => None
      }
      for (p <- sx; q <- sy) yield p.compare(q)
  }

  private object AttrName {
    def unapply(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case u: UnresolvedAttribute => Some(u.name)
      case _ => None
    }
  }

  /** Column-API predicates arrive ANALYZER-unresolved: the node
    * converter leaves `a <= b` as `UnresolvedFunction("<=", …)` because
    * operator→expression mapping lives in the FunctionRegistry. Map the
    * handful of operators the evaluator understands; anything else stays
    * unresolved and falls through to `case _ => true` (conservative). */
  private def resolveOps(e: Expression): Expression = e.transformUp {
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if f.nameParts.lengthCompare(1) == 0 && !f.isDistinct &&
          f.filter.isEmpty =>
      val a = f.arguments
      (f.nameParts.head.toLowerCase(java.util.Locale.ROOT), a) match {
        case ("<", Seq(l, r)) => LessThan(l, r)
        case ("<=", Seq(l, r)) => LessThanOrEqual(l, r)
        case (">", Seq(l, r)) => GreaterThan(l, r)
        case (">=", Seq(l, r)) => GreaterThanOrEqual(l, r)
        case ("=" | "==", Seq(l, r)) => EqualTo(l, r)
        case ("and", Seq(l, r)) => And(l, r)
        case ("or", Seq(l, r)) => Or(l, r)
        case ("not", Seq(c)) => Not(c)
        case ("isnull", Seq(c)) => IsNull(c)
        case ("isnotnull", Seq(c)) => IsNotNull(c)
        case ("in", l +: rest) if rest.nonEmpty => In(l, rest)
        case _ => f
      }
  }

  /** Inclusive evaluation of `pred` against a dir's stats: false ⇒ NO
    * row in the dir can satisfy the predicate (safe to skip the file
    * without reading it); true ⇒ unknown or possible. Conservative on
    * every shape it doesn't understand — which is what makes adding
    * cases an optimization, never a correctness change. Comparison
    * semantics are SQL's: a NULL cell never satisfies a comparison,
    * so null counts only matter to IsNull/IsNotNull. */
  def mayMatch(pred: Expression, st: Stats): Boolean =
    evalMay(resolveOps(pred), st)

  private def evalMay(pred: Expression, st: Stats): Boolean = {
    if (st.rows == 0) return false // an empty dir matches nothing
    def col(n: String): Option[ColStats] = st.cols.get(n)
    pred match {
      case And(l, r) => evalMay(l, st) && evalMay(r, st)
      case Or(l, r) => evalMay(l, st) || evalMay(r, st)
      case EqualTo(AttrName(n), Literal(v, _)) => containsValue(col(n), v)
      case EqualTo(Literal(v, _), AttrName(n)) => containsValue(col(n), v)
      case GreaterThan(AttrName(n), Literal(v, _)) => above(col(n), v, strict = true)
      case GreaterThanOrEqual(AttrName(n), Literal(v, _)) => above(col(n), v, strict = false)
      case LessThan(AttrName(n), Literal(v, _)) => below(col(n), v, strict = true)
      case LessThanOrEqual(AttrName(n), Literal(v, _)) => below(col(n), v, strict = false)
      // literal-first comparisons flip
      case GreaterThan(Literal(v, _), AttrName(n)) => below(col(n), v, strict = true)
      case GreaterThanOrEqual(Literal(v, _), AttrName(n)) => below(col(n), v, strict = false)
      case LessThan(Literal(v, _), AttrName(n)) => above(col(n), v, strict = true)
      case LessThanOrEqual(Literal(v, _), AttrName(n)) => above(col(n), v, strict = false)
      case In(AttrName(n), vs) if vs.forall(_.isInstanceOf[Literal]) =>
        vs.exists { case Literal(v, _) => containsValue(col(n), v) }
      case IsNull(AttrName(n)) =>
        col(n).forall(c => c.nulls != 0) // -1 (unknown) stays true
      case IsNotNull(AttrName(n)) =>
        col(n).forall(c => c.nulls < 0 || c.nulls < st.rows)
      case _ => true
    }
  }

  /** min ≤ v ≤ max (unknown ⇒ true). */
  private def containsValue(c: Option[ColStats], v: Any): Boolean =
    c.forall { cs =>
      val lo = cmp(v, cs.min); val hi = cmp(v, cs.max)
      !(lo.exists(_ < 0) || hi.exists(_ > 0))
    }

  /** some cell can be >(=) v ⇔ max >(=) v (unknown ⇒ true). */
  private def above(c: Option[ColStats], v: Any, strict: Boolean): Boolean =
    c.forall(cs => cmp(cs.max, v)
      .forall(x => if (strict) x > 0 else x >= 0))

  /** some cell can be <(=) v ⇔ min <(=) v (unknown ⇒ true). */
  private def below(c: Option[ColStats], v: Any, strict: Boolean): Boolean =
    c.forall(cs => cmp(cs.min, v)
      .forall(x => if (strict) x < 0 else x <= 0))
}
