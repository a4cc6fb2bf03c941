package graft.ig

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._

/** CPython `json.dumps(obj, indent=2, ensure_ascii=False)`-compatible
  * serializer over Spark internal rows (reference
  * analyze_insta_enhanced.py:2014-2017 — the analyzed.json byte contract).
  *
  * Why InternalRow and not external Rows: Scala's external `Map` converter
  * rebuilds maps as `HashMap` above 4 entries, destroying the insertion
  * order that Python dicts (and therefore the golden bytes) depend on;
  * `MapData` keeps the engine's entry order.
  *
  * Number formatting follows CPython exactly:
  *  - ints print without a decimal point;
  *  - floats print with `repr` (shortest round-trip digits, positional
  *    notation for 1e-4 <= |x| < 1e16, else `d.dde±XX`);
  *  - a Spark DOUBLE column may hold a value that Python computed as an
  *    int (e.g. `round(0, 2)` returns int 0; `statistics.mean` of ints
  *    returns an exact int when the division is even) — [[NumMode]]
  *    declares, per field path, which Python code path produced it.
  */
object PyJson {

  /** How a Spark DoubleType field maps back to a Python number. */
  sealed trait NumMode
  /** Always a Python float (true-division results: engagement rates). */
  case object AsFloat extends NumMode
  /** Always a Python int (int arithmetic stored in a double column). */
  case object AsInt extends NumMode
  /** `statistics.mean` of ints: int when the mean is exact, else float
    * (reference analyze_insta_enhanced.py:645,649). */
  case object IntIfWhole extends NumMode
  /** Python-int only on the `0` default path (`round(0, 2)` → int 0,
    * dict defaults); any computed value is a float. */
  case object IntIfZero extends NumMode

  /** Field-path (dots, array segments transparent, map values inherit the
    * map's path) → Python number mode for double-typed columns. */
  val reportModes: Map[String, NumMode] = Map(
    "average_engagement_rate" -> IntIfZero,
    "engagement_metrics.engagement_rate" -> IntIfZero,
    "engagement_metrics.consistency_score" -> IntIfZero,
    "niche_data.niche_scores" -> IntIfZero,
    "niche_data.confidence_scores" -> AsInt,
    "partnership_data.avg_sponsored_engagement" -> IntIfWhole,
    "partnership_data.avg_organic_engagement" -> IntIfWhole,
    // post_data['engagement_rate'] is initialized to int 0 and never
    // recomputed (analyze_insta_enhanced.py:612-625)
    "partnership_data.sponsored_posts.engagement_rate" -> AsInt)

  /** Paths whose Python value is a dict default that stays `{}` when the
    * computing branch is not reached; our schema holds a null struct
    * there (engagement_comparison: analyze_insta_enhanced.py:551,652-658). */
  val emptyDictPaths: Set[String] = Set("partnership_data.engagement_comparison")

  private def pad(sb: StringBuilder, n: Int): Unit = { var i = 0; while (i < n) { sb.append(' '); i += 1 } }

  /** CPython `repr(float)`: shortest digit string that round-trips. */
  def pyFloat(d: Double): String = {
    if (d.isNaN) return "NaN"
    if (d.isInfinite) return if (d > 0) "Infinity" else "-Infinity"
    var s: String = null
    var p = 0
    while (s == null && p <= 16) {
      val c = String.format("%." + p + "e", Double.box(d))
      if (c.toDouble == d) s = c
      p += 1
    }
    val neg = s.startsWith("-")
    val body = if (neg) s.substring(1) else s
    val e = body.indexOf('e')
    val digits = body.substring(0, e).replace(".", "")
    val exp = body.substring(e + 1).toInt
    val sb = new StringBuilder(if (neg) "-" else "")
    if (exp >= 16 || exp < -4) {
      sb.append(digits.charAt(0))
      if (digits.length > 1) sb.append('.').append(digits.substring(1))
      sb.append('e').append(if (exp >= 0) '+' else '-')
      val ae = math.abs(exp)
      if (ae < 10) sb.append('0')
      sb.append(ae)
    } else if (exp >= 0) {
      if (digits.length > exp + 1)
        sb.append(digits.substring(0, exp + 1)).append('.').append(digits.substring(exp + 1))
      else {
        sb.append(digits)
        var i = digits.length
        while (i < exp + 1) { sb.append('0'); i += 1 }
        sb.append(".0")
      }
    } else {
      sb.append("0.")
      var i = -exp - 1
      while (i > 0) { sb.append('0'); i -= 1 }
      sb.append(digits)
    }
    sb.toString
  }

  /** json.dumps string escaping with ensure_ascii=False: only `"`, `\`
    * and control chars are escaped; everything else is raw UTF-8. */
  def pyString(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb.append('"')
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
    sb.toString
  }

  private def renderDouble(sb: StringBuilder, d: Double, path: String,
                           modes: Map[String, NumMode]): Unit =
    modes.getOrElse(path, AsFloat) match {
      case AsInt => sb.append(d.toLong)
      case IntIfWhole if d == math.floor(d) && !d.isInfinite => sb.append(d.toLong)
      case IntIfZero if d == 0.0 => sb.append('0')
      case _ => sb.append(pyFloat(d))
    }

  /** Render one internal value of type `dt` at `ind` columns of current
    * indentation (the caller has already emitted the leading prefix). */
  def render(sb: StringBuilder, v: Any, dt: DataType, path: String, ind: Int,
             modes: Map[String, NumMode]): Unit = {
    if (v == null) {
      sb.append(if (emptyDictPaths(path)) "{}" else "null"); return
    }
    dt match {
      case StringType => sb.append(pyString(v.toString))
      case BooleanType => sb.append(if (v.asInstanceOf[Boolean]) "true" else "false")
      case LongType => sb.append(v.asInstanceOf[Long])
      case IntegerType => sb.append(v.asInstanceOf[Int])
      case ShortType => sb.append(v.asInstanceOf[Short].toInt)
      case ByteType => sb.append(v.asInstanceOf[Byte].toInt)
      case DoubleType => renderDouble(sb, v.asInstanceOf[Double], path, modes)
      case FloatType => renderDouble(sb, v.asInstanceOf[Float].toDouble, path, modes)
      case st: StructType =>
        val row = v.asInstanceOf[InternalRow]
        sb.append("{\n")
        var i = 0
        while (i < st.length) {
          if (i > 0) sb.append(",\n")
          pad(sb, ind + 2)
          val f = st.fields(i)
          sb.append(pyString(f.name)).append(": ")
          val child = if (row.isNullAt(i)) null else row.get(i, f.dataType)
          render(sb, child, f.dataType,
            if (path.isEmpty) f.name else path + "." + f.name, ind + 2, modes)
          i += 1
        }
        sb.append('\n'); pad(sb, ind); sb.append('}')
      case at: ArrayType =>
        val arr = v.asInstanceOf[ArrayData]
        if (arr.numElements() == 0) { sb.append("[]"); return }
        sb.append("[\n")
        var i = 0
        while (i < arr.numElements()) {
          if (i > 0) sb.append(",\n")
          pad(sb, ind + 2)
          val child = if (arr.isNullAt(i)) null else arr.get(i, at.elementType)
          render(sb, child, at.elementType, path, ind + 2, modes)
          i += 1
        }
        sb.append('\n'); pad(sb, ind); sb.append(']')
      case mt: MapType =>
        val m = v.asInstanceOf[MapData]
        if (m.numElements() == 0) { sb.append("{}"); return }
        val keys = m.keyArray(); val vals = m.valueArray()
        sb.append("{\n")
        var i = 0
        while (i < m.numElements()) {
          if (i > 0) sb.append(",\n")
          pad(sb, ind + 2)
          sb.append(pyString(keys.get(i, mt.keyType).toString)).append(": ")
          val child = if (vals.isNullAt(i)) null else vals.get(i, mt.valueType)
          render(sb, child, mt.valueType, path, ind + 2, modes)
          i += 1
        }
        sb.append('\n'); pad(sb, ind); sb.append('}')
      case other =>
        throw new IllegalArgumentException(s"PyJson: unsupported type $other at $path")
    }
  }

  /** Compact rendering — CPython `json.dumps(obj, ensure_ascii=False)`
    * DEFAULT separators `(', ', ': ')`, no newlines (the form the CSV
    * report's JSON-dump cells use, jsontocsv_enhanced.py:201-253). */
  def renderCompact(sb: StringBuilder, v: Any, dt: DataType, path: String,
                    modes: Map[String, NumMode]): Unit = {
    if (v == null) {
      sb.append(if (emptyDictPaths(path)) "{}" else "null"); return
    }
    dt match {
      case st: StructType =>
        val row = v.asInstanceOf[InternalRow]
        sb.append('{')
        var i = 0
        while (i < st.length) {
          if (i > 0) sb.append(", ")
          val f = st.fields(i)
          sb.append(pyString(f.name)).append(": ")
          val child = if (row.isNullAt(i)) null else row.get(i, f.dataType)
          renderCompact(sb, child, f.dataType,
            if (path.isEmpty) f.name else path + "." + f.name, modes)
          i += 1
        }
        sb.append('}')
      case at: ArrayType =>
        val arr = v.asInstanceOf[ArrayData]
        sb.append('[')
        var i = 0
        while (i < arr.numElements()) {
          if (i > 0) sb.append(", ")
          val child = if (arr.isNullAt(i)) null else arr.get(i, at.elementType)
          renderCompact(sb, child, at.elementType, path, modes)
          i += 1
        }
        sb.append(']')
      case mt: MapType =>
        val m = v.asInstanceOf[MapData]
        val keys = m.keyArray(); val vals = m.valueArray()
        sb.append('{')
        var i = 0
        while (i < m.numElements()) {
          if (i > 0) sb.append(", ")
          sb.append(pyString(keys.get(i, mt.keyType).toString)).append(": ")
          val child = if (vals.isNullAt(i)) null else vals.get(i, mt.valueType)
          renderCompact(sb, child, mt.valueType, path, modes)
          i += 1
        }
        sb.append('}')
      case _ => render(sb, v, dt, path, 0, modes) // scalars share one form
    }
  }

  /** Serialize one creator row (top-level object of the creators array). */
  def renderRow(row: InternalRow, schema: StructType, indent: Int,
                modes: Map[String, NumMode] = reportModes): String = {
    val sb = new StringBuilder(8192)
    render(sb, row, schema, "", indent, modes)
    sb.toString
  }

  /** Compact-serialize one value rooted at `path` in the report schema
    * (so the [[reportModes]] lookups line up). */
  def renderValueCompact(v: Any, dt: DataType, path: String,
                         modes: Map[String, NumMode] = reportModes): String = {
    val sb = new StringBuilder(1024)
    renderCompact(sb, v, dt, path, modes)
    sb.toString
  }
}
