package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import FilterLang._

/** Compiles a filter-DSL AST to a Catalyst `Column`.
  *
  * Two resolution modes mirror the reference's two metadata shapes
  * (query/compiler.go evaluates against decoded JSON):
  *  - **column mode**: identifiers are DataFrame columns (incl. nested
  *    struct fields and array indices). Predicates are native Catalyst
  *    expressions, so parquet predicate pushdown and codegen apply.
  *  - **json mode**: identifiers are paths inside one JSON string
  *    column (like the reference's per-record metadata blob), resolved
  *    with `get_json_object`, with casts driven by the literal side.
  */
object FilterCompiler {

  /** Column mode: compile against a DataFrame's schema. `params` bind
    * `:name` placeholders (reference: query/parser.go parseParameter). */
  def compile(filter: String, df: DataFrame, params: Map[String, Any] = Map.empty): Column =
    compileNode(bind(FilterLang.parse(filter), params), new ColumnResolver(df.schema))

  /** JSON mode: compile against a JSON string column. */
  def compileJson(filter: String, jsonCol: Column, params: Map[String, Any] = Map.empty): Column =
    compileNode(bind(FilterLang.parse(filter), params), new JsonResolver(jsonCol))

  /** Substitute Param nodes with literal values (numbers normalized to
    * Double to match the lexer's number representation). */
  private def bind(node: Node, params: Map[String, Any]): Node = {
    def norm(v: Any): Any = v match {
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case f: Float => f.toDouble
      case other => other
    }
    def go(n: Node): Node = n match {
      case Param(name) => Lit(norm(params.getOrElse(name,
        throw new IllegalArgumentException(s"unbound filter parameter :$name"))))
      case And(l, r) => And(go(l), go(r))
      case Or(l, r) => Or(go(l), go(r))
      case Not(x) => Not(go(x))
      case Cmp(op, l, r) => Cmp(op, go(l), go(r))
      case StrOp(op, l, r) => StrOp(op, go(l), go(r))
      case In(e, a, neg) => In(go(e), go(a), neg)
      case ArrayLit(vs) => ArrayLit(vs.map(go))
      case Length(a) => Length(go(a))
      case Quant(op, c) => Quant(op, go(c))
      case other => other
    }
    go(node)
  }

  // ---------- resolvers ----------
  private[query] trait Resolver {
    /** Resolve a path to (column, static type if known, exists in schema). */
    def resolve(ref: Ref): (Column, Option[DataType], Boolean)
  }

  /** Walk Field/Index/LengthSeg segments from a typed starting column
    * (shared by [[ColumnResolver]] and the per-element resolution
    * inside ANY/ALL). */
  private def walkSegs(c0: Column, dt0: Option[DataType],
                       segs: List[PathSeg]): (Column, Option[DataType], Boolean) = {
    var c = c0
    var dt = dt0
    var exists = true
    segs.foreach {
      case Field(name) =>
        dt match {
          case Some(st: StructType) =>
            st.find(_.name == name) match {
              case Some(f) => c = c.getField(name); dt = Some(f.dataType)
              case None    => c = lit(null); dt = None; exists = false
            }
          case _ => c = c.getField(name); dt = None
        }
      case Index(i) =>
        // get() tolerates out-of-bounds like the reference (query/
        // compiler.go "[]": nil for invalid index); getItem throws
        // under ANSI mode.
        c = get(c, lit(i))
        dt = dt.collect { case ArrayType(et, _) => et }
      case LengthSeg =>
        c = dt match {
          case Some(_: ArrayType) => size(c).cast("double")
          case Some(_: MapType)   => size(c).cast("double")
          case _                  => length(c).cast("double")
        }
        dt = Some(DoubleType)
      case StarSeg =>
        throw new IllegalArgumentException("[*] is only allowed inside ANY(...) / ALL(...)")
    }
    (c, dt, exists)
  }

  private[query] final class ColumnResolver(schema: StructType) extends Resolver {
    def resolve(ref: Ref): (Column, Option[DataType], Boolean) = ref.path match {
      case Field(name) :: rest =>
        schema.find(_.name == name) match {
          case Some(f) => walkSegs(col(name), Some(f.dataType), rest)
          case None    => (lit(null), None, false)
        }
      case other =>
        throw new IllegalArgumentException(s"path must start with a field, got $other")
    }
  }

  private[query] final class JsonResolver(jsonCol: Column) extends Resolver {
    def resolve(ref: Ref): (Column, Option[DataType], Boolean) = {
      val (segs, hasLength) = ref.path.last match {
        case LengthSeg => (ref.path.init, true)
        case _         => (ref.path, false)
      }
      val jsonPath = "$" + segs.map {
        case Field(n)  => s".$n"
        case Index(i)  => s"[$i]"
        case LengthSeg => throw new IllegalArgumentException(".length only allowed at path end")
        case StarSeg   => throw new IllegalArgumentException("[*] is only allowed inside ANY(...) / ALL(...)")
      }.mkString
      val c = get_json_object(jsonCol, jsonPath)
      if (hasLength) {
        // arrays report element count, plain strings their char count
        val asArrLen = json_array_length(c).cast("double")
        (coalesce(asArrLen, length(c).cast("double")), Some(DoubleType), true)
      } else (c, None, true)
    }
  }

  /** Resolves the starred Ref of an ANY/ALL condition against the
    * current array element (`elem`); everything else delegates to the
    * enclosing resolver, so conditions can mix element fields with
    * top-level fields. */
  private final class ElementResolver(outer: Resolver, elem: Column,
                                      elemDt: Option[DataType], val json: Boolean) extends Resolver {
    def resolve(ref: Ref): (Column, Option[DataType], Boolean) = {
      val i = ref.path.indexOf(StarSeg)
      if (i < 0) outer.resolve(ref)
      else {
        val suffix = ref.path.drop(i + 1)
        if (suffix.contains(StarSeg))
          throw new IllegalArgumentException("nested [*] is not supported")
        if (!json) walkSegs(elem, elemDt, suffix)
        else {
          // elements arrive as raw JSON text (from_json to
          // array<string> preserves object/scalar source text)
          val (segs, hasLength) = suffix.lastOption match {
            case Some(LengthSeg) => (suffix.init, true)
            case _               => (suffix, false)
          }
          val c =
            if (segs.isEmpty) elem
            else get_json_object(elem, "$" + segs.map {
              case Field(n) => s".$n"
              case Index(ix) => s"[$ix]"
              case other => throw new IllegalArgumentException(s"unexpected $other after [*]")
            }.mkString)
          if (hasLength)
            (coalesce(json_array_length(c).cast("double"), length(c).cast("double")),
              Some(DoubleType), true)
          else (c, None, true)
        }
      }
    }
  }

  /** All distinct array prefixes (path up to `[*]`) referenced in an
    * ANY/ALL condition. */
  private def starPrefixes(node: Node): List[List[PathSeg]] = {
    def go(n: Node): List[List[PathSeg]] = n match {
      case Ref(path) if path.contains(StarSeg) => List(path.takeWhile(_ != StarSeg))
      case Ref(_) | Lit(_) | Param(_) => Nil
      case ArrayLit(vs) => vs.flatMap(go)
      case Cmp(_, l, r) => go(l) ++ go(r)
      case StrOp(_, l, r) => go(l) ++ go(r)
      case And(l, r) => go(l) ++ go(r)
      case Or(l, r) => go(l) ++ go(r)
      case Not(x) => go(x)
      case In(e, a, _) => go(e) ++ go(a)
      case Exists(ref, _) => go(ref)
      case Length(a) => go(a)
      case Quant(_, c) => go(c)
    }
    go(node).distinct
  }

  // ---------- compilation ----------
  private def compileNode(node: Node, r: Resolver): Column = node match {
    case And(l, rr) => compileNode(l, r) && compileNode(rr, r)
    case Or(l, rr)  => compileNode(l, r) || compileNode(rr, r)
    case Not(n)     => !compileNode(n, r)

    case Cmp(op, l, rr) =>
      val (lc, rc) = coerceOperands(l, rr, r)
      op match {
        case "==" => rr match {
          case Lit(null) => lc.isNull
          case _ => lc === rc
        }
        case "!=" => rr match {
          case Lit(null) => lc.isNotNull
          case _ => lc =!= rc
        }
        case ">"  => lc > rc
        case ">=" => lc >= rc
        case "<"  => lc < rc
        case "<=" => lc <= rc
      }

    case StrOp(op, l, rr) =>
      val (lc, ldt, _) = operand(l, r)
      val rv = rr match {
        case Lit(s: String) => s
        case _ => throw new IllegalArgumentException(s"$op requires a string literal")
      }
      (op, ldt) match {
        case ("CONTAINS", Some(_: ArrayType)) => array_contains(lc, rv)
        case ("CONTAINS", _)    => lc.contains(rv)
        case ("STARTS_WITH", _) => lc.startsWith(rv)
        case ("ENDS_WITH", _)   => lc.endsWith(rv)
        case ("MATCHES", _)     => lc.rlike(normalizeRe2(rv))
      }

    case In(expr, ArrayLit(vals), negated) =>
      val (lc, ldt, _) = operand(expr, r)
      val lits = vals.map {
        case Lit(v) => narrowNum(v)
        case other  => throw new IllegalArgumentException(s"IN list must hold literals, got $other")
      }
      // numeric-cast the json-string column when the list is numeric
      val castLc = if (ldt.isEmpty && vals.forall(_.isInstanceOf[Lit] ) &&
        lits.forall(v => v.isInstanceOf[Long] || v.isInstanceOf[Double])) lc.cast("double") else lc
      val in = castLc.isin(lits: _*)
      if (negated) !in else in
    case In(_, other, _) =>
      throw new IllegalArgumentException(s"IN requires an array literal, got $other")

    case Exists(ref, negated) =>
      val (c, _, inSchema) = r.resolve(ref)
      if (!inSchema) lit(negated)
      else if (negated) c.isNull else c.isNotNull

    case Length(arg) => arg match {
      case Ref(path) => r.resolve(Ref(path :+ LengthSeg))._1
      case _ => throw new IllegalArgumentException("LENGTH requires a field reference")
    }

    // ANY/ALL over one array: compile the condition per element via a
    // higher-order function — stays inside whole-stage codegen, no
    // explode/shuffle (reference: query/compiler.go:107-152).
    case Quant(op, cond) =>
      val prefixes = starPrefixes(cond)
      if (prefixes.isEmpty)
        throw new IllegalArgumentException(s"$op requires a path containing [*]")
      if (prefixes.length > 1)
        throw new IllegalArgumentException(
          s"$op condition must reference a single [*] array, got ${prefixes.length}")
      val (arrRaw, adt, inSchema) = r.resolve(Ref(prefixes.head))
      if (!inSchema) lit(false) // missing array errors out the record in the reference
      else {
        val json = r.isInstanceOf[JsonResolver] ||
          (r match { case er: ElementResolver => er.json; case _ => false })
        val (arrCol, elemDt) =
          if (json) (from_json(arrRaw, ArrayType(StringType)), None)
          else (arrRaw, adt.collect { case ArrayType(et, _) => et })
        // per-element nulls: the reference skips non-bool matches —
        // neutral for ALL (true), non-match for ANY (false)
        def pred(x: Column): Column = {
          val p = compileNode(cond, new ElementResolver(r, x, elemDt, json))
          coalesce(p, lit(op == "ALL"))
        }
        val q = if (op == "ANY") exists(arrCol, pred) else forall(arrCol, pred)
        // a null / non-array value errors out the record in the reference
        coalesce(q, lit(false))
      }

    case Ref(_) | Lit(_) | ArrayLit(_) =>
      operand(node, r)._1
  }

  private def operand(node: Node, r: Resolver): (Column, Option[DataType], Boolean) = node match {
    case ref: Ref  => r.resolve(ref)
    case Lit(null) => (lit(null), None, true)
    case Lit(v)    => (lit(narrowNum(v)), Some(litType(v)), true)
    case Length(arg) => (compileNode(Length(arg), r), Some(DoubleType), true)
    case other     => (compileNode(other, r), Some(BooleanType), true)
  }

  /** MATCHES dialect guard: the reference evaluates patterns with Go
    * RE2 (query/compiler.go:426 regexp.MatchString); Spark's `rlike`
    * uses java.util.regex. Both are UNANCHORED substring matchers and
    * agree on the core syntax the reference exercises (classes,
    * quantifiers, `^`/`$` anchors — query/compiler_test.go:296), but
    * two RE2 spellings are invalid or different in Java and are
    * rewritten here:
    *  - POSIX classes `[[:alpha:]]` → `\p{Alpha}` (Java has no POSIX
    *    bracket form)
    *  - named groups `(?P<name>...)` → `(?<name>...)`
    * Residual divergence (Java-only lookaround/backreferences) is
    * Java-accepting-MORE, so every RE2-legal reference pattern
    * behaves identically. */
  private[query] def normalizeRe2(pattern: String): String = {
    val posix = Map(
      "alpha" -> "\\p{Alpha}", "digit" -> "\\p{Digit}", "alnum" -> "\\p{Alnum}",
      "upper" -> "\\p{Upper}", "lower" -> "\\p{Lower}", "space" -> "\\p{Space}",
      "punct" -> "\\p{Punct}", "xdigit" -> "\\p{XDigit}", "cntrl" -> "\\p{Cntrl}",
      "print" -> "\\p{Print}", "graph" -> "\\p{Graph}", "blank" -> "\\p{Blank}",
      "word"  -> "\\w")
    val p1 = posix.foldLeft(pattern) { case (acc, (name, jav)) =>
      acc.replace(s"[[:$name:]]", s"[$jav]").replace(s"[:$name:]", jav)
    }
    p1.replace("(?P<", "(?<")
  }

  /** Integral number literals become LongType so comparisons against
    * integer columns need no cast — an uncast predicate pushes down to
    * the parquet scan, a cast one does not. */
  private def narrowNum(v: Any): Any = v match {
    case d: Double if d.isWhole && d.abs < Long.MaxValue.toDouble => d.toLong
    case other => other
  }

  private def litType(v: Any): DataType = v match {
    case _: String  => StringType
    case _: Double  => DoubleType
    case _: Boolean => BooleanType
    case _          => NullType
  }

  /** When one side is an untyped JSON string extraction and the other a
    * typed literal, cast the extraction to the literal's type (the
    * reference compares decoded-JSON values type-sensitively,
    * query/compiler.go:268-322). */
  private def coerceOperands(l: Node, rr: Node, r: Resolver): (Column, Column) = {
    val (lc, ldt, _) = operand(l, r)
    val (rc, rdt, _) = operand(rr, r)
    (ldt, rdt) match {
      case (None, Some(DoubleType))  => (lc.cast("double"), rc)
      case (None, Some(BooleanType)) => (lc.cast("boolean"), rc)
      case (Some(DoubleType), None)  => (lc, rc.cast("double"))
      case (Some(BooleanType), None) => (lc, rc.cast("boolean"))
      case _ => (lc, rc)
    }
  }
}
