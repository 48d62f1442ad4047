package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** tablite expression-string filters → Catalyst predicates.
  *
  * The reference compiles the expression string with Python's own
  * compiler into a row function (tablite/utils.py:55-83) and maps it
  * over every row (tablite/redux.py:12-32) — the documented grammar is
  * Python boolean expressions over column names:
  *
  *   "all((A==B, C!=4, 200<D))"      → AND-fold of the tuple
  *   "any((A==B, C!=4))"             → OR-fold
  *   "a>=3 and b<=20"                → boolean connectives
  *   "1 < d < 4"                     → Python comparison CHAIN
  *   "x in ('a','b')"  /  "x in 'abc'" (substring)  /  "x is None"
  *
  * Here the same grammar compiles to ONE Catalyst `Column` predicate —
  * whole-stage-codegen'd and pushdown-eligible, never a per-row
  * interpreter. Python-isms translated, not approximated:
  *
  *  - chained comparisons expand to conjunctions (`1<d<4` → `1<d AND d<4`);
  *  - `x == None` / `x is None` → IS NULL (Python's `== None` is true
  *    exactly for None; SQL `= NULL` would be three-valued false);
  *  - `x in <string>` → substring containment (Python `in` on str);
  *    `x in (tuple)` → SQL IN;
  *  - `and`/`or`/`not` keep Python precedence (comparisons bind tighter).
  *
  * Column names must appear verbatim and exist in `columns` — same
  * constraint as the reference (its compiled function's argument list
  * is the column names found in the expression).
  */
object ExpressionInterpreter {

  def compile(expression: String, columns: Seq[String]): Column =
    new Parser(tokenize(expression), expression, columns.toSet).parseAll()

  // ---- tokens -------------------------------------------------------

  private sealed trait Tok
  private case class Ident(s: String) extends Tok // also keywords
  private case class Num(s: String) extends Tok
  private case class Str(s: String) extends Tok
  private case class Op(s: String) extends Tok // == != >= <= < > ( ) , + - * / %

  private def tokenize(e: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < e.length) {
      val c = e(i)
      if (c.isWhitespace) i += 1
      else if (c.isLetter || c == '_') {
        val j = e.indexWhere(ch => !(ch.isLetterOrDigit || ch == '_'), i)
        val end = if (j < 0) e.length else j
        out += Ident(e.substring(i, end)); i = end
      } else if (c.isDigit || (c == '.' && i + 1 < e.length && e(i + 1).isDigit)) {
        // digits/dot mantissa, then an optional [eE][+-]?digits exponent —
        // the sign must be consumed WITH the exponent or `1e-5` would
        // tokenize as Num("1e") and fail to parse as a number
        var end = i
        while (end < e.length && (e(end).isDigit || e(end) == '.')) end += 1
        if (end < e.length && (e(end) == 'e' || e(end) == 'E')) {
          var k = end + 1
          if (k < e.length && (e(k) == '+' || e(k) == '-')) k += 1
          if (k < e.length && e(k).isDigit) {
            while (k < e.length && e(k).isDigit) k += 1
            end = k
          }
        }
        out += Num(e.substring(i, end)); i = end
      } else if (c == '\'' || c == '"') {
        val close = e.indexOf(c, i + 1)
        require(close >= 0, s"unterminated string literal in: $e")
        out += Str(e.substring(i + 1, close)); i = close + 1
      } else if (i + 1 < e.length && Set("==", "!=", ">=", "<=")(e.substring(i, i + 2))) {
        out += Op(e.substring(i, i + 2)); i += 2
      } else if ("<>(),+-*/%".contains(c)) {
        out += Op(c.toString); i += 1
      } else throw new IllegalArgumentException(
        s"expression: unexpected character '$c' at $i in: $e")
    }
    out.result()
  }

  // ---- parser (Python precedence: or < and < not < cmp < arith) -----

  private final class Parser(toks: Vector[Tok], src: String, cols: Set[String]) {
    private var p = 0
    private def peek: Option[Tok] = if (p < toks.length) Some(toks(p)) else None
    private def next(): Tok = {
      require(p < toks.length, s"expression: unexpected end of input in: $src")
      val t = toks(p); p += 1; t
    }
    private def at(s: String): Boolean = peek match {
      case Some(Op(o)) => o == s
      case Some(Ident(k)) => k == s
      case _ => false
    }
    private def eat(s: String): Unit =
      if (at(s)) p += 1
      else throw new IllegalArgumentException(s"expression: expected '$s' in: $src")

    def parseAll(): Column = {
      val c = orExpr()
      require(p == toks.length, s"expression: trailing tokens in: $src")
      c
    }

    private def orExpr(): Column = {
      var c = andExpr()
      while (at("or")) { eat("or"); c = c || andExpr() }
      c
    }
    private def andExpr(): Column = {
      var c = notExpr()
      while (at("and")) { eat("and"); c = c && notExpr() }
      c
    }
    private def notExpr(): Column =
      if (at("not")) { eat("not"); !notExpr() } else comparison()

    /** NULL marks the Python None literal through the arith layer. */
    private case class Operand(col: Column, isNone: Boolean)

    private def comparison(): Column = {
      // all((...)) / any((...)) — tuple folds
      peek match {
        case Some(Ident(k @ ("all" | "any"))) if toks.lift(p + 1).contains(Op("(")) =>
          p += 1; eat("(")
          // Python form is all((e1, e2, …)) — the INNER parens are the
          // tuple literal; tolerate the paren-less all(e1, e2, …) too
          val tupleParens = at("(") && {
            // lookahead: grouped single expr `all((a>b))` vs tuple —
            // a tuple has a ',' at depth 1 relative to this paren
            var d = 0; var i = p; var comma = false; var done = false
            while (i < toks.length && !done) {
              toks(i) match {
                case Op("(") => d += 1
                case Op(")") => d -= 1; if (d == 0) done = true
                case Op(",") if d == 1 => comma = true
                case _ => ()
              }
              i += 1
            }
            comma
          }
          if (tupleParens) eat("(")
          val parts = tupleOf(() => orExpr())
          if (tupleParens) eat(")")
          eat(")")
          return if (k == "all") parts.reduce(_ && _) else parts.reduce(_ || _)
        case _ => ()
      }
      var lhs = arith()
      var result: Option[Column] = None
      var chained = false
      def fold(c: Column): Unit = result = Some(result.fold(c)(_ && c))
      while (isCmpStart) {
        chained = true
        peek match {
          case Some(Ident("is")) =>
            p += 1
            val neg = at("not"); if (neg) p += 1
            peek match {
              case Some(Ident("None")) => p += 1
              case _ => throw new IllegalArgumentException(
                s"expression: 'is' supports only None in: $src")
            }
            fold(if (neg) lhs.col.isNotNull else lhs.col.isNull)
            lhs = Operand(lit(null), isNone = true)
          case Some(Ident("in")) =>
            p += 1; fold(inPredicate(lhs)); lhs = Operand(lit(true), isNone = false)
          case Some(Ident("not")) =>
            p += 1; eat("in"); fold(!inPredicate(lhs)); lhs = Operand(lit(true), isNone = false)
          case Some(Op(o)) =>
            p += 1
            val rhs = arith()
            fold(cmp(o, lhs, rhs))
            lhs = rhs // Python chain: each operand compares to its neighbour
          case other => throw new IllegalArgumentException(
            s"expression: unexpected $other in: $src")
        }
      }
      if (!chained) lhs.col else result.get
    }

    private def isCmpStart: Boolean = peek match {
      case Some(Op(o)) => Set("==", "!=", ">=", "<=", "<", ">")(o)
      case Some(Ident(k)) => k == "in" || k == "is" ||
        (k == "not" && toks.lift(p + 1).contains(Ident("in")))
      case _ => false
    }

    private def cmp(op: String, a: Operand, b: Operand): Column = {
      // Python `x == None` is an identity-ish test true exactly for None
      if (a.isNone || b.isNone) {
        val target = if (a.isNone) b.col else a.col
        op match {
          case "==" => target.isNull
          case "!=" => target.isNotNull
          case _ => lit(false) // None is unorderable in Python 3 → no match
        }
      } else op match {
        case "==" => a.col === b.col
        case "!=" => a.col =!= b.col
        case ">=" => a.col >= b.col
        case "<=" => a.col <= b.col
        case "<"  => a.col < b.col
        case ">"  => a.col > b.col
      }
    }

    /** `x in (…)` → IN-list; `x in <str>` → substring containment. */
    private def inPredicate(lhs: Operand): Column = peek match {
      case Some(Op("(")) =>
        eat("(")
        val items = tupleOf(() => arith().col)
        eat(")")
        lhs.col.isin(items: _*)
      case _ =>
        val rhs = arith()
        rhs.col.contains(lhs.col)
    }

    private def tupleOf[A](elem: () => A): Seq[A] = {
      val items = Seq.newBuilder[A]
      items += elem()
      while (at(",")) {
        eat(",")
        if (!at(")")) items += elem() // tolerate trailing comma
      }
      items.result()
    }

    private def arith(): Operand = {
      var a = term()
      while (at("+") || at("-")) {
        val op = next().asInstanceOf[Op].s
        val b = term()
        a = Operand(if (op == "+") a.col + b.col else a.col - b.col, isNone = false)
      }
      a
    }
    private def term(): Operand = {
      var a = unary()
      while (at("*") || at("/") || at("%")) {
        val op = next().asInstanceOf[Op].s
        val b = unary()
        a = Operand(op match {
          case "*" => a.col * b.col
          case "/" => a.col / b.col
          case _   => a.col % b.col
        }, isNone = false)
      }
      a
    }
    private def unary(): Operand =
      if (at("-")) { eat("-"); val a = unary(); Operand(-a.col, isNone = false) }
      else atom()

    private def atom(): Operand = next() match {
      case Num(s) =>
        Operand(if (s.contains('.') || s.toLowerCase.contains('e'))
          lit(s.toDouble) else lit(s.toLong), isNone = false)
      case Str(s) => Operand(lit(s), isNone = false)
      case Ident("None") => Operand(lit(null), isNone = true)
      case Ident("True") => Operand(lit(true), isNone = false)
      case Ident("False") => Operand(lit(false), isNone = false)
      case Ident(name) =>
        require(cols.contains(name),
          s"expression references unknown column '$name' (have: ${cols.mkString(", ")})")
        Operand(col(name), isNone = false)
      case Op("(") =>
        val c = orExpr()
        eat(")")
        Operand(c, isNone = false)
      case other => throw new IllegalArgumentException(
        s"expression: unexpected $other in: $src")
    }
  }
}
