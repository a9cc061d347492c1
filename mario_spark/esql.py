"""ES|QL — Elasticsearch's piped query language (8.11+), compiled onto
DataFrames.

The supported subset is the language's core pipeline:

    FROM <table>
    | WHERE <clause> [AND ...]                    clause: <col> <op> <lit> | col IN (...)
                                                  | col LIKE "pat%" | NOT <clause>
    | EVAL <name> = <col> <arith> <col|literal>   arith: + - * /
    | STATS <name> = FN(<col>|*) [WHERE <cond>] [, ...] [BY <key> [, ...]]
                                                  FN: COUNT SUM AVG MIN MAX MEDIAN
                                                  COUNT_DISTINCT PERCENTILE(col, p)
                                                  key: <col> | n = BUCKET(<ts>, 1 day|hour|...)
    | SORT <col> [ASC|DESC] [, ...]
    | LIMIT <n>
    | KEEP <col> [, ...]
    | ENRICH <table> ON <col> WITH <col> [, ...]
    | DISSECT <col> "<pattern>"                   %{name} captures between literals
    | GROK <col> "<pattern>"                      %{PRIM:name[:type]} regex primitives
    | INLINESTATS <name> = FN(...) [BY ...]       STATS attached to rows, not collapsing
    | SAMPLE <probability>                        deterministic md5-coin Bernoulli sample
    | CHANGE_POINT <value> ON <key>               max-deviation row of a series, typed
    | LOOKUP JOIN <table> ON <col>                left join on an equi-key (lookup index)
    | FORK ( <pipe> ... ) ( <pipe> ... )          branch the pipeline; union + _fork tag
    | MV_EXPAND <col>                             one row per value of a multi-value col
    | RENAME <old> AS <new> [, ...]
    | DROP <col> [, ...]

EVAL also accepts the multi-value constructor SPLIT(<col>, "<delim>")
(what MV_EXPAND typically expands), the conditional
CASE(cond, value, ..., default), and the common scalar functions
LENGTH TO_UPPER TO_LOWER TRIM LTRIM RTRIM SUBSTRING CONCAT ROUND ABS
FLOOR CEIL SQRT POW LOG10 EXP GREATEST LEAST TO_LONG TO_DOUBLE
TO_STRING COALESCE STARTS_WITH ENDS_WITH REPLACE LEFT RIGHT LOCATE
REVERSE — each compiled 1:1 to a Catalyst builtin — plus the
multi-value family MV_COUNT MV_MIN MV_MAX MV_SUM MV_AVG MV_SORT
MV_DEDUPE MV_CONCAT (array builtins / HOFs, still codegen) and the
date functions DATE_TRUNC(1 unit, col), DATE_FORMAT("fmt", col),
DATE_DIFF("unit", a, b) (complete units of epoch difference) and
DATE_EXTRACT("part", col).

WHERE supports OR with SQL precedence (AND binds tighter), IS NULL /
IS NOT NULL, and RLIKE "<regex>" alongside IN / LIKE / NOT. STATS adds
TOP(col, n, "asc"|"desc"), VALUES(col) (sorted for engine-stable
hashing; ES|QL leaves multivalue order undefined), STD_DEV (population,
like extended_stats std_deviation), and WEIGHTED_AVG(value, weight).
SORT accepts NULLS FIRST / NULLS LAST. A pipeline may also start with
ROW name = literal, ... (a one-row literal source) instead of FROM.

Each pipe stage compiles to exactly one DataFrame operation, so the
whole pipeline is ONE Catalyst plan — filters fold into the scan,
STATS is a single hash agg, SORT+LIMIT fuse to TakeOrderedAndProject.
Floating aggregation outputs (SUM/AVG over doubles) are rounded 4dp —
the engine-wide hash-stability contract.

Like the real parser, malformed input raises a ValueError naming the
offending stage; unknown commands are rejected, not ignored.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

_CMP = {"==": "=", "!=": "!=", ">=": ">=", "<=": "<=", ">": ">", "<": "<"}
_FNS = {
    "COUNT", "SUM", "AVG", "MIN", "MAX", "MEDIAN", "COUNT_DISTINCT",
    "PERCENTILE", "TOP", "VALUES", "STD_DEV", "WEIGHTED_AVG",
}

# GROK primitive -> regex fragment (the commonly-used subset of the
# logstash pattern library; each must be group-free so numbered capture
# groups map 1:1 to the %{...:name} fields).
_GROK_PRIMS = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "IP": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
}
_GROK_TYPES = {"int": "long", "long": "long", "float": "double"}

# EVAL scalar functions -> Catalyst builtins (each stays in codegen).
# LENGTH returns long (ES|QL integer widened for engine-stable hashing);
# SUBSTRING is 1-based like ES|QL/SQL.
_EVAL_FNS = {
    "LENGTH": lambda c: F.length(c).cast("long"),
    "TO_UPPER": lambda c: F.upper(c),
    "TO_LOWER": lambda c: F.lower(c),
    "TRIM": lambda c: F.trim(c),
    "SUBSTRING": lambda c, start, ln=None: (
        F.substring(c, start, ln) if ln is not None else F.substring(c, start, 2147483647)
    ),
    "CONCAT": lambda *cs: F.concat(*cs),
    "ROUND": lambda c, n=None: F.round(c, n) if n is not None else F.round(c),
    "ABS": lambda c: F.abs(c),
    "FLOOR": lambda c: F.floor(c),
    "CEIL": lambda c: F.ceil(c),
    "SQRT": lambda c: F.sqrt(c),
    "TO_LONG": lambda c: c.cast("long"),
    "TO_INTEGER": lambda c: c.cast("long"),  # widened, like LENGTH
    "TO_DOUBLE": lambda c: c.cast("double"),
    "TO_STRING": lambda c: c.cast("string"),
    "COALESCE": lambda *cs: F.coalesce(*cs),
    "LTRIM": lambda c: F.ltrim(c),
    "RTRIM": lambda c: F.rtrim(c),
    "POW": lambda a, b: F.pow(a, b),
    "LOG10": lambda c: F.log10(c),
    "EXP": lambda c: F.exp(c),
    "GREATEST": lambda *cs: F.greatest(*cs),
    "LEAST": lambda *cs: F.least(*cs),
    "STARTS_WITH": lambda c, p: c.startswith(p),
    "ENDS_WITH": lambda c, s: c.endswith(s),
    "REPLACE": lambda c, a, b: F.replace(c, a, b),
    # ES|QL LOCATE(string, substring) -> 1-based position, 0 if absent
    "LEFT": lambda c, n: F.substring(c, 1, n),
    "RIGHT": lambda c, n: F.when(n >= F.length(c), c).otherwise(
        F.substring(c, -n, n)
    ),
    "LOCATE": lambda s, sub: F.position(sub, s).cast("long"),
    "REVERSE": lambda c: F.reverse(c),
    # multi-value family: array builtins/HOFs, all whole-stage codegen.
    # MV_COUNT of NULL is NULL (ES|QL contract), of [] is 0.
    "MV_COUNT": lambda c: F.when(c.isNotNull(), F.size(c).cast("long")),
    "MV_MIN": lambda c: F.array_min(c),
    "MV_MAX": lambda c: F.array_max(c),
    "MV_SUM": lambda c: F.round(
        F.aggregate(c, F.lit(0.0), lambda a, x: a + x.cast("double")), 4
    ),
    "MV_AVG": lambda c: F.when(
        F.size(c) > 0,
        F.round(
            F.aggregate(c, F.lit(0.0), lambda a, x: a + x.cast("double"))
            / F.size(c),
            4,
        ),
    ),
    "MV_SORT": lambda c: F.sort_array(c),
    "MV_DEDUPE": lambda c: F.array_sort(F.array_distinct(c)),
}

# DATE_EXTRACT parts and DATE_DIFF units (seconds per unit — DATE_DIFF
# is complete units of epoch difference, the subtract-and-convert
# reading of the ES|QL contract; calendar-aware day boundaries belong
# to DATE_TRUNC/BUCKET).
_DATE_PARTS = {
    "year": F.year, "month": F.month, "day": F.dayofmonth,
    "hour": F.hour, "minute": F.minute, "second": F.second,
    "dayofweek": F.dayofweek,
}
_DIFF_SECONDS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}


def _grok(df: DataFrame, body: str) -> DataFrame:
    """GROK <col> "<pattern>": regex-primitive extraction. Compiles the
    whole pattern to ONE anchored regex; each named field is a
    regexp_extract of its capture group (pure codegen, no UDF), cast
    when the field carries a :type suffix."""
    m = re.fullmatch(r"(\w+)\s+(?:\"(.+)\"|'(.+)')", body.strip())
    if not m:
        raise ValueError(f"ES|QL: bad GROK {body!r}")
    col = m.group(1)
    pat = m.group(2) if m.group(2) is not None else m.group(3)
    fields = []  # (name, cast-type or None)
    rx, pos = "", 0
    for mf in re.finditer(r"%\{(\w+):(\w+)(?::(\w+))?\}", pat):
        prim, name, typ = mf.groups()
        if prim not in _GROK_PRIMS:
            raise ValueError(f"ES|QL: unknown GROK primitive {prim!r}")
        if typ is not None and typ not in _GROK_TYPES:
            raise ValueError(f"ES|QL: unknown GROK type {typ!r}")
        rx += re.escape(pat[pos : mf.start()])
        rx += "(" + _GROK_PRIMS[prim] + ")"
        pos = mf.end()
        fields.append((name, _GROK_TYPES[typ] if typ else None))
    if not fields:
        raise ValueError("ES|QL: GROK pattern has no fields")
    rx = "^" + rx + re.escape(pat[pos:]) + "$"
    for gi, (name, typ) in enumerate(fields, start=1):
        c = F.regexp_extract(F.col(col), rx, gi)
        df = df.withColumn(name, c.cast(typ) if typ else c)
    return df


def _lit(tok: str):
    if tok.upper() == "NULL":
        return F.lit(None)
    if tok.startswith('"') and tok.endswith('"'):
        return F.lit(tok[1:-1])
    if re.fullmatch(r"-?\d+", tok):
        return F.lit(int(tok))
    if re.fullmatch(r"-?\d+\.\d+", tok):
        return F.lit(float(tok))
    return F.col(tok)


def _where(df: DataFrame, body: str) -> DataFrame:
    return df.filter(_cond_expr(body))


def _eval(df: DataFrame, body: str) -> DataFrame:
    # multi-value constructor: name = SPLIT(col, "delim")
    ms = re.fullmatch(
        r"(\w+)\s*=\s*SPLIT\(\s*(\w+)\s*,\s*\"([^\"]*)\"\s*\)",
        body.strip(),
        re.IGNORECASE,
    )
    if ms:
        name, col, delim = ms.groups()
        return df.withColumn(name, F.split(F.col(col), re.escape(delim)))
    # MV_CONCAT(col, "delim") — array_join's delimiter is a plan-time
    # string, so this can't ride the generic Column-arg path
    mj = re.fullmatch(
        r"(\w+)\s*=\s*MV_CONCAT\(\s*(\w+)\s*,\s*\"([^\"]*)\"\s*\)",
        body.strip(),
        re.IGNORECASE,
    )
    if mj:
        name, col, delim = mj.groups()
        return df.withColumn(name, F.array_join(F.col(col), delim))
    # date functions with plan-time unit/format/part arguments
    md = re.fullmatch(
        r"(\w+)\s*=\s*DATE_TRUNC\(\s*1\s+(\w+)\s*,\s*(\w+)\s*\)",
        body.strip(),
        re.IGNORECASE,
    )
    if md:
        name, unit, col = md.groups()
        if unit.lower() not in _BUCKET_UNITS:
            raise ValueError(f"ES|QL: unknown DATE_TRUNC unit {unit!r}")
        return df.withColumn(
            name,
            F.date_format(
                F.date_trunc(unit.lower(), F.col(col).cast("timestamp")),
                "yyyy-MM-dd HH:mm:ss",
            ),
        )
    md = re.fullmatch(
        r"(\w+)\s*=\s*DATE_FORMAT\(\s*\"([^\"]+)\"\s*,\s*(\w+)\s*\)",
        body.strip(),
        re.IGNORECASE,
    )
    if md:
        name, fmt, col = md.groups()
        return df.withColumn(
            name, F.date_format(F.col(col).cast("timestamp"), fmt)
        )
    md = re.fullmatch(
        r"(\w+)\s*=\s*DATE_DIFF\(\s*\"(\w+)\"\s*,\s*(\w+)\s*,\s*(\w+)\s*\)",
        body.strip(),
        re.IGNORECASE,
    )
    if md:
        name, unit, a, b = md.groups()
        if unit.lower() not in _DIFF_SECONDS:
            raise ValueError(f"ES|QL: unknown DATE_DIFF unit {unit!r}")
        secs = _DIFF_SECONDS[unit.lower()]
        delta = F.unix_timestamp(F.col(b).cast("timestamp")) - F.unix_timestamp(
            F.col(a).cast("timestamp")
        )
        # complete units, toward zero (ES|QL: negative when b < a)
        return df.withColumn(
            name,
            (
                F.signum(delta) * F.floor(F.abs(delta) / F.lit(secs))
            ).cast("long"),
        )
    md = re.fullmatch(
        r"(\w+)\s*=\s*DATE_EXTRACT\(\s*\"(\w+)\"\s*,\s*(\w+)\s*\)",
        body.strip(),
        re.IGNORECASE,
    )
    if md:
        name, part, col = md.groups()
        if part.lower() not in _DATE_PARTS:
            raise ValueError(f"ES|QL: unknown DATE_EXTRACT part {part!r}")
        return df.withColumn(
            name,
            _DATE_PARTS[part.lower()](F.col(col).cast("timestamp")).cast(
                "long"
            ),
        )
    # conditional: name = CASE(cond, value, [cond, value, ...,] default)
    # — conditions use the WHERE clause grammar; compiles to one
    # chained when/otherwise (pure codegen)
    mc = re.fullmatch(
        r"(\w+)\s*=\s*CASE\(\s*(.+)\)", body.strip(), re.IGNORECASE
    )
    if mc:
        name, argstr = mc.groups()
        parts = [a.strip() for a in _split_commas(argstr)]
        if len(parts) < 3 or len(parts) % 2 == 0:
            raise ValueError(
                f"ES|QL: CASE needs cond/value pairs plus a default in "
                f"{body!r}"
            )
        expr = None
        for i in range(0, len(parts) - 1, 2):
            cond, val = _cond_expr(parts[i]), _lit(parts[i + 1])
            expr = F.when(cond, val) if expr is None else expr.when(cond, val)
        return df.withColumn(name, expr.otherwise(_lit(parts[-1])))
    # scalar function call: name = FN(arg[, arg...]) — the common ES|QL
    # string/math functions, each a 1:1 Catalyst builtin (codegen)
    mf = re.fullmatch(
        r"(\w+)\s*=\s*([A-Za-z_]\w*)\(\s*([^()]*)\)", body.strip()
    )
    if mf and mf.group(2).upper() in _EVAL_FNS:
        name, fn, argstr = mf.group(1), mf.group(2).upper(), mf.group(3)
        args = [
            _lit(a.strip()) for a in _split_args(argstr) if a.strip() != ""
        ]
        try:
            return df.withColumn(name, _EVAL_FNS[fn](*args))
        except TypeError as e:  # wrong arity
            raise ValueError(f"ES|QL: bad EVAL {body!r}: {e}") from e
    m = re.fullmatch(
        r"(\w+)\s*=\s*(\w+)\s*([+\-*/])\s*(\"[^\"]*\"|-?[\w.]+)",
        body.strip(),
    )
    if not m:
        raise ValueError(f"ES|QL: bad EVAL {body!r}")
    name, a, op, bb = m.groups()
    left, right = F.col(a), _lit(bb)
    expr = {
        "+": left + right, "-": left - right,
        "*": left * right, "/": left / right,
    }[op]
    return df.withColumn(name, expr)


def _split_args(argstr: str) -> list[str]:
    """Split a function-call argument list on commas outside quotes
    (REPLACE(text, ",", ";") keeps its quoted commas)."""
    out, buf, in_q = [], [], False
    for ch in argstr:
        if ch == '"':
            in_q = not in_q
        if ch == "," and not in_q:
            out.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    if in_q:
        raise ValueError(f"ES|QL: unbalanced quote in {argstr!r}")
    out.append("".join(buf))
    return out


def _split_cond_kw(body: str, kw: str) -> list[str]:
    """Split a condition on a top-level keyword (OR / AND): the split
    point must be outside double quotes AND outside parens, so string
    literals like "cats OR dogs" and IN-lists survive intact."""
    out: list[str] = []
    buf: list[str] = []
    i, depth, in_q = 0, 0, False
    sep = re.compile(rf"\s+{kw}\s+")
    while i < len(body):
        ch = body[i]
        if ch == '"':
            in_q = not in_q
        elif not in_q:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif depth == 0 and ch.isspace():
                m = sep.match(body, i)
                if m:
                    out.append("".join(buf))
                    buf = []
                    i = m.end()
                    continue
        buf.append(ch)
        i += 1
    out.append("".join(buf))
    return out


def _cond_expr(body: str):
    """Parse the WHERE condition grammar into a Column (shared by the
    WHERE stage and per-agg STATS filters). OR splits at the top with
    SQL precedence (AND binds tighter); each AND-chained clause is a
    comparison, `col IN (lit, ...)`, `col LIKE "pat%"` (ES|QL wildcard
    semantics: % and _), `col RLIKE "regex"`, `col IS [NOT] NULL`,
    optionally prefixed with NOT. Splits are quote- and paren-aware
    (a literal "cats OR dogs" is not a disjunction)."""
    parts = _split_cond_kw(body, "OR")
    if len(parts) > 1:
        expr = _cond_expr(parts[0])
        for p in parts[1:]:
            expr = expr | _cond_expr(p)
        return expr
    cond = None
    for clause in _split_cond_kw(body, "AND"):
        clause = clause.strip()
        neg = False
        mn = re.match(r"NOT\s+(.*)", clause, re.IGNORECASE)
        if mn:
            neg, clause = True, mn.group(1).strip()
        # a parenthesised group recurses into the full condition
        # grammar: `a OR (b AND c)`, `NOT (a OR b)`
        if _paren_wrapped(clause):
            expr = _cond_expr(clause.strip()[1:-1])
            if neg:
                expr = ~expr
            cond = expr if cond is None else (cond & expr)
            continue
        mi = re.fullmatch(
            r"(\w+)\s+IN\s*\(\s*([^()]+)\)", clause, re.IGNORECASE
        )
        ml = re.fullmatch(
            r"(\w+)\s+LIKE\s+\"([^\"]*)\"", clause, re.IGNORECASE
        )
        mr = re.fullmatch(
            r"(\w+)\s+RLIKE\s+\"([^\"]*)\"", clause, re.IGNORECASE
        )
        mnull = re.fullmatch(
            r"(\w+)\s+IS\s+(NOT\s+)?NULL", clause, re.IGNORECASE
        )
        m = re.fullmatch(
            r"(\w+)\s*(==|!=|>=|<=|>|<)\s*(\"[^\"]*\"|-?[\d.]+|\w+)",
            clause,
        )
        if mnull:
            c = F.col(mnull.group(1))
            expr = c.isNotNull() if mnull.group(2) else c.isNull()
        elif mr:
            expr = F.col(mr.group(1)).rlike(mr.group(2))
        elif mi:
            col, lits = mi.groups()
            vals = []
            for tok in lits.split(","):
                tok = tok.strip()
                if tok.startswith('"') and tok.endswith('"'):
                    vals.append(tok[1:-1])
                elif re.fullmatch(r"-?\d+", tok):
                    vals.append(int(tok))
                elif re.fullmatch(r"-?\d+\.\d+", tok):
                    vals.append(float(tok))
                else:
                    raise ValueError(f"ES|QL: bad IN literal {tok!r}")
            expr = F.col(col).isin(vals)
        elif ml:
            expr = F.col(ml.group(1)).like(ml.group(2))
        elif m:
            col, op, lit = m.groups()
            c = F.col(col)
            lv = _lit(lit)
            expr = {
                "==": c == lv, "!=": c != lv, ">": c > lv,
                ">=": c >= lv, "<": c < lv, "<=": c <= lv,
            }[op]
        else:
            raise ValueError(f"ES|QL: bad WHERE clause {clause!r}")
        if neg:
            expr = ~expr
        cond = expr if cond is None else (cond & expr)
    return cond


_BUCKET_UNITS = {
    "minute": "minute", "hour": "hour", "day": "day",
    "week": "week", "month": "month", "year": "year",
}


def _by_key(spec: str) -> tuple[str, "F.Column"]:
    """One STATS BY key -> (name, column): a bare column, or the
    time-series idiom `name = BUCKET(col, 1 unit)` — compiled to
    date_trunc (formatted back to a string key so the bucket column is
    engine-portable)."""
    m = re.fullmatch(
        r"(\w+)\s*=\s*BUCKET\(\s*(\w+)\s*,\s*1\s+(\w+)\s*\)",
        spec.strip(),
        re.IGNORECASE,
    )
    if m:
        name, col, unit = m.group(1), m.group(2), m.group(3).lower()
        if unit not in _BUCKET_UNITS:
            raise ValueError(f"ES|QL: unknown BUCKET unit {unit!r}")
        return name, F.date_format(
            F.date_trunc(_BUCKET_UNITS[unit], F.col(col).cast("timestamp")),
            "yyyy-MM-dd HH:mm:ss",
        )
    if not re.fullmatch(r"\w+", spec.strip()):
        raise ValueError(f"ES|QL: bad BY key {spec!r}")
    name = spec.strip()
    return name, F.col(name)


def _split_commas(body: str) -> list[str]:
    """Split on commas at paren depth 0 only (a BUCKET(col, 1 day) key
    keeps its inner comma)."""
    out, buf, depth = [], [], 0
    for ch in body:
        depth += ch == "("
        depth -= ch == ")"
        if ch == "," and depth == 0:
            out.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    out.append("".join(buf))
    return out


def _stats(df: DataFrame, body: str) -> DataFrame:
    if " BY " in body:
        aggs_part, by_part = body.split(" BY ", 1)
        keys = [
            c.alias(n)
            for n, c in (_by_key(k) for k in _split_commas(by_part))
        ]
    else:
        aggs_part, keys = body, []
    aggs = []
    for spec in _split_commas(aggs_part):
        m = re.fullmatch(
            r"(\w+)\s*=\s*(\w+)\(\s*(\*|\w+)"
            r"(?:\s*,\s*(\"\w+\"|[\w.]+))?"
            r"(?:\s*,\s*(\"\w+\"|[\w.]+))?\s*\)"
            r"(?:\s+WHERE\s+(.+))?",
            spec.strip(),
        )
        if not m:
            raise ValueError(f"ES|QL: bad STATS {spec!r}")
        name, fn, col, arg, arg2, flt = m.groups()
        fn = fn.upper()
        if fn not in _FNS:
            raise ValueError(f"ES|QL: unknown function {fn}")
        # per-agg WHERE (ES|QL 8.16): the filter masks this aggregate's
        # input only — compiled as a conditional column, so every
        # filtered aggregate still runs in the SAME single hash agg
        src = F.col(col) if col != "*" else F.lit(1)
        if flt:
            src = F.when(_cond_expr(flt), src)
        if fn == "TOP":
            # TOP(col, n, "asc"|"desc"): the n extreme values as a
            # multivalue — collect_list skips masked (null) inputs;
            # sort_array makes the result order-deterministic
            order = (arg2 or '"desc"').strip('"').lower()
            if arg is None or order not in ("asc", "desc"):
                raise ValueError(f"ES|QL: bad TOP spec {spec!r}")
            aggs.append(
                F.slice(
                    F.sort_array(F.collect_list(src), asc=order == "asc"),
                    1,
                    int(arg),
                ).alias(name)
            )
        elif fn == "VALUES":
            # ES|QL leaves multivalue order undefined; sorted here for
            # engine-stable hashing
            aggs.append(F.array_sort(F.collect_set(src)).alias(name))
        elif fn == "STD_DEV":
            aggs.append(F.round(F.stddev_pop(src), 4).alias(name))
        elif fn == "WEIGHTED_AVG":
            if arg is None or not re.fullmatch(r"\w+", arg):
                raise ValueError(f"ES|QL: WEIGHTED_AVG needs a weight column")
            w = F.col(arg)
            if flt:
                w = F.when(_cond_expr(flt), w)
            aggs.append(
                F.round(
                    F.sum(src * F.col(arg)) / F.sum(w), 4
                ).alias(name)
            )
        elif fn == "COUNT":
            aggs.append(F.count(src).cast("long").alias(name))
        elif fn == "COUNT_DISTINCT":
            aggs.append(F.countDistinct(src).cast("long").alias(name))
        elif fn == "PERCENTILE":
            if arg is None:
                raise ValueError(f"ES|QL: PERCENTILE needs a percent arg")
            aggs.append(
                F.round(
                    F.percentile(src, F.lit(float(arg) / 100.0)), 4
                ).alias(name)
            )
        elif fn == "SUM":
            aggs.append(F.round(F.sum(src), 4).alias(name))
        elif fn == "AVG":
            aggs.append(F.round(F.avg(src), 4).alias(name))
        elif fn == "MEDIAN":
            aggs.append(
                F.round(F.percentile(src, F.lit(0.5)), 4).alias(name)
            )
        elif fn == "MIN":
            aggs.append(F.min(src).alias(name))
        else:
            aggs.append(F.max(src).alias(name))
    return df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)


def _inlinestats(df: DataFrame, body: str) -> DataFrame:
    """INLINESTATS: same grammar as STATS, but the aggregates are
    attached to every row instead of collapsing the table — compiled
    as the grouped agg broadcast-joined back on the BY keys (the group
    table is tiny next to the corpus, so the fact rows never
    shuffle)."""
    g = _stats(df, body)
    if " BY " in body:
        names = []
        for spec in _split_commas(body.split(" BY ", 1)[1]):
            n, c = _by_key(spec)
            if n not in df.columns:  # computed key (BUCKET): attach it
                df = df.withColumn(n, c)
            names.append(n)
        return df.join(F.broadcast(g), names, "left")
    return df.crossJoin(F.broadcast(g))


def _split_stages(query: str) -> list[str]:
    """Split a pipeline on top-level '|' only — pipes inside FORK's
    parenthesised branches belong to the branch, and pipes (or parens)
    inside a "string literal" belong to the string, not the outer
    pipeline."""
    out, buf, depth, inq = [], [], 0, False
    for ch in query:
        if ch == '"':
            inq = not inq
        elif not inq:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth < 0:
                    raise ValueError("ES|QL: unbalanced ')'")
        if ch == "|" and depth == 0 and not inq:
            out.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    if depth != 0:
        raise ValueError("ES|QL: unbalanced '('")
    if inq:
        raise ValueError("ES|QL: unterminated string literal")
    out.append("".join(buf).strip())
    return [s for s in out if s]


def _paren_wrapped(s: str) -> bool:
    """True iff `s` is one balanced '( ... )' group (quote-aware), so
    the parens can be stripped and the inside re-parsed — what makes
    `a OR (b AND c)` and `NOT (a OR b)` grammar, not syntax errors."""
    s = s.strip()
    if not (s.startswith("(") and s.endswith(")")):
        return False
    depth, inq = 0, False
    for i, ch in enumerate(s):
        if ch == '"':
            inq = not inq
        elif not inq:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0 and i < len(s) - 1:
                    return False  # closes before the end: not one group
    return depth == 0 and not inq


def _paren_groups(body: str) -> list[str]:
    """Top-level '( ... )' groups of a FORK body."""
    groups, buf, depth = [], [], 0
    for ch in body:
        if ch == "(":
            depth += 1
            if depth == 1:
                continue
        elif ch == ")":
            depth -= 1
            if depth < 0:
                raise ValueError("ES|QL: unbalanced ')' in FORK")
            if depth == 0:
                groups.append("".join(buf).strip())
                buf = []
                continue
        if depth > 0:
            buf.append(ch)
        elif not ch.isspace():
            raise ValueError(f"ES|QL: stray {ch!r} in FORK body")
    if depth != 0:
        raise ValueError("ES|QL: unbalanced '(' in FORK")
    return groups


def run_esql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    stages = _split_stages(query.strip())
    if not stages:
        raise ValueError("ES|QL: empty query")
    mrow = re.fullmatch(r"ROW\s+(.+)", stages[0], re.IGNORECASE | re.DOTALL)
    m = re.fullmatch(r"FROM\s+(\w+)", stages[0], re.IGNORECASE)
    if mrow:
        # ROW name = literal, ...: a one-row literal source
        cols = []
        for part in _split_args(mrow.group(1)):
            m2 = re.fullmatch(
                r"(\w+)\s*=\s*(\"[^\"]*\"|-?[\d.]+)", part.strip()
            )
            if not m2:
                raise ValueError(f"ES|QL: bad ROW field {part!r}")
            cols.append(_lit(m2.group(2)).alias(m2.group(1)))
        df = spark.range(1).select(*cols)
    elif m and m.group(1) in _TABLES:
        df = spark.read.parquet(f"{sf_dir}/{m.group(1)}.parquet")
    else:
        raise ValueError(f"ES|QL: bad FROM {stages[0]!r}")
    kws = [s.split(None, 1)[0].upper() for s in stages]
    for i, stage in enumerate(stages[1:], start=1):
        # FORK materializes per-branch ranks (_fork_rank) ONLY when a
        # FUSE stage later consumes them — a plain FORK output must
        # match ES|QL's column contract (no internal rank column).
        df = _apply_stage(
            spark, sf_dir, df, stage,
            fuse_follows="FUSE" in kws[i + 1:],
        )
    return df


def _parse_sort_order(body: str) -> list:
    """SORT body -> list of Spark sort Columns (shared by SORT and the
    FORK rank capture, so a branch's rank is derived from the EXACT
    ordering its SORT declared)."""
    order = []
    for part in body.split(","):
        m2 = re.fullmatch(
            r"(\w+)(?:\s+(ASC|DESC))?(?:\s+NULLS\s+(FIRST|LAST))?",
            part.strip(),
            re.IGNORECASE,
        )
        if not m2:
            raise ValueError(f"ES|QL: bad SORT key {part!r}")
        col, direc, nulls = m2.groups()
        desc = (direc or "ASC").upper() == "DESC"
        # ES|QL default: nulls sort last under ASC, first under DESC
        # (nulls are "largest") — same as Spark's default
        nulls = (nulls or ("FIRST" if desc else "LAST")).upper()
        c = F.col(col)
        order.append(
            {
                (False, "FIRST"): c.asc_nulls_first(),
                (False, "LAST"): c.asc_nulls_last(),
                (True, "FIRST"): c.desc_nulls_first(),
                (True, "LAST"): c.desc_nulls_last(),
            }[(desc, nulls)]
        )
    return order


def _apply_stage(
    spark: SparkSession,
    sf_dir: str,
    df: DataFrame,
    stage: str,
    fuse_follows: bool = False,
) -> DataFrame:
    # whitespace-agnostic keyword split: tabs/newlines after the
    # command word are legal ES|QL (partition(" ") would swallow them)
    parts = stage.split(None, 1)
    kw = parts[0].upper()
    body = parts[1] if len(parts) > 1 else ""
    if kw == "WHERE":
        df = _where(df, body)
    elif kw == "EVAL":
        df = _eval(df, body)
    elif kw == "STATS":
        df = _stats(df, body)
    elif kw == "INLINESTATS":
        df = _inlinestats(df, body)
    elif kw == "SORT":
        df = df.orderBy(*_parse_sort_order(body))
    elif kw == "LIMIT":
        df = df.limit(int(body))
    elif kw == "KEEP":
        df = df.select(*[c.strip() for c in body.split(",")])
    elif kw == "ENRICH":
        m2 = re.fullmatch(
            r"(\w+)\s+ON\s+(\w+)\s+WITH\s+(.+)", body.strip()
        )
        if not m2 or m2.group(1) not in _TABLES:
            raise ValueError(f"ES|QL: bad ENRICH {body!r}")
        tbl, on, with_cols = m2.groups()
        dim = spark.read.parquet(f"{sf_dir}/{tbl}.parquet")
        # enrich policies key the dim on its first column (the
        # TPC-H-style primary key convention of the fixture tables)
        dim_key = dim.columns[0]
        keep = [c.strip() for c in with_cols.split(",")]
        df = df.join(
            F.broadcast(dim.select(dim_key, *keep)),
            df[on] == dim[dim_key],
            "left",
        ).drop(dim_key)
    elif kw == "RENAME":
        for part in body.split(","):
            m2 = re.fullmatch(
                r"(\w+)\s+AS\s+(\w+)", part.strip(), re.IGNORECASE
            )
            if not m2:
                raise ValueError(f"ES|QL: bad RENAME {part!r}")
            df = df.withColumnRenamed(m2.group(1), m2.group(2))
    elif kw == "DROP":
        df = df.drop(*[c.strip() for c in body.split(",")])
    elif kw == "DISSECT":
        m2 = re.fullmatch(
            r"(\w+)\s+(?:\"(.+)\"|'(.+)')", body.strip()
        )
        if not m2:
            raise ValueError(f"ES|QL: bad DISSECT {body!r}")
        col = m2.group(1)
        pat = m2.group(2) if m2.group(2) is not None else m2.group(3)
        names = re.findall(r"%\{(\w+)\}", pat)
        if not names:
            raise ValueError(f"ES|QL: DISSECT pattern has no fields")
        # literals escaped, %{name} -> a non-greedy capture (the
        # dissect contract: fields are delimited by the literals)
        rx = ""
        pos = 0
        for m3 in re.finditer(r"%\{(\w+)\}", pat):
            rx += re.escape(pat[pos : m3.start()]) + "(.*?)"
            pos = m3.end()
        rx += re.escape(pat[pos:]) + "$"
        rx = "^" + rx
        for gi, name in enumerate(names, start=1):
            df = df.withColumn(
                name, F.regexp_extract(F.col(col), rx, gi)
            )
    elif kw == "GROK":
        df = _grok(df, body)
    elif kw == "SAMPLE":
        m2 = re.fullmatch(r"(0?\.\d+)", body.strip())
        if not m2:
            raise ValueError(f"ES|QL: bad SAMPLE {body!r}")
        p = float(m2.group(1))
        from mario_spark.ops.sample import hash_unit

        # deterministic divergence from ES (which uses an RNG):
        # the coin is the engine's md5 unit hash keyed on the
        # table's first column — reproducible across runs/engines,
        # still a pure map-side filter that fuses into the scan
        df = df.filter(hash_unit(F.col(df.columns[0])) < p)
    elif kw == "MV_EXPAND":
        col = body.strip()
        if not re.fullmatch(r"\w+", col) or col not in df.columns:
            raise ValueError(f"ES|QL: bad MV_EXPAND {body!r}")
        # one row per element, in place — Generate(explode) keeps
        # the parent partitioning, no shuffle
        df = df.withColumn(col, F.explode(F.col(col)))
    elif kw == "CHANGE_POINT":
        # CHANGE_POINT <value> ON <key> (ES|QL 8.18): the row where the
        # series deviates most from its mean, typed spike/dip — the
        # deterministic core of ES's test battery (same kernel as the
        # change_point agg). Runs on the piped table, which at this
        # point is a reduced series (post-STATS), so the 1-row mean
        # broadcast and TakeOrderedAndProject finish are O(series).
        m2 = re.fullmatch(r"(\w+)\s+ON\s+(\w+)", body.strip(), re.IGNORECASE)
        if not m2 or m2.group(1) not in df.columns or m2.group(2) not in df.columns:
            raise ValueError(f"ES|QL: bad CHANGE_POINT {body!r}")
        val, key = m2.groups()
        stats = df.agg(F.avg(val).alias("_mu"))
        df = (
            df.crossJoin(F.broadcast(stats))
            .withColumn("_dev", F.abs(F.col(val) - F.col("_mu")))
            .withColumn(
                "type",
                F.when(F.col(val) >= F.col("_mu"), F.lit("spike")).otherwise(
                    F.lit("dip")
                ),
            )
            .orderBy(F.desc("_dev"), F.asc(key))
            .limit(1)
            .drop("_mu", "_dev")
        )
    elif kw == "LOOKUP":
        # LOOKUP JOIN <table> ON <col> (ES|QL 8.18): left join on a
        # SAME-NAMED key in both sides (rename first if they differ),
        # bringing in every other lookup column. The lookup side is an
        # ES "lookup index" — small by contract, so broadcast.
        m2 = re.fullmatch(
            r"JOIN\s+(\w+)\s+ON\s+(\w+)", body.strip(), re.IGNORECASE
        )
        if not m2 or m2.group(1) not in _TABLES:
            raise ValueError(f"ES|QL: bad LOOKUP JOIN {body!r}")
        tbl, on = m2.groups()
        dim = spark.read.parquet(f"{sf_dir}/{tbl}.parquet")
        if on not in df.columns or on not in dim.columns:
            raise ValueError(
                f"ES|QL: LOOKUP JOIN key {on!r} must exist on both sides"
            )
        df = df.join(F.broadcast(dim), on, "left")
    elif kw == "FORK":
        # FORK ( <pipe...> ) ( <pipe...> ): run each branch on the
        # current table, tag rows with _fork = forkN, union by name
        # (missing columns null-filled) — ES|QL 8.19 semantics
        branches = _paren_groups(body)
        if len(branches) < 2:
            raise ValueError("ES|QL: FORK needs at least two branches")
        from pyspark.sql import Window

        outs = []
        for i, br in enumerate(branches, start=1):
            b = df
            last_sort = None
            for st in _split_stages(br):
                b = _apply_stage(spark, sf_dir, b, st)
                kw2 = st.split(None, 1)[0].upper()
                if kw2 == "SORT":
                    # whitespace-agnostic body extraction (tabs and
                    # newlines between SORT and its keys are legal)
                    last_sort = st.split(None, 1)[1]
                elif kw2 not in (
                    "LIMIT", "KEEP", "DROP", "RENAME", "WHERE",
                ):
                    # a later collapsing stage (STATS, MV_EXPAND, ...)
                    # invalidates the captured ordering; WHERE is a
                    # filter — it preserves relative order, so the
                    # declared SORT still ranks the surviving rows
                    last_sort = None
            if last_sort is not None:
                keys = [
                    re.match(r"\w+", p.strip()).group(0)
                    for p in last_sort.split(",")
                ]
                if not all(c in b.columns for c in keys):
                    # a KEEP/DROP/RENAME after SORT removed a sort key:
                    # the branch DECLARED an ordering that is no longer
                    # derivable — fusing on a substituted _score order
                    # would silently contradict it, so refuse
                    if fuse_follows:
                        raise ValueError(
                            f"ES|QL: FORK branch {i} sorts by "
                            f"{last_sort!r} but a later KEEP/DROP/"
                            "RENAME removed the sort key(s); FUSE "
                            "cannot rank the branch — keep the sort "
                            "keys in the branch output"
                        )
                    last_sort = None
            # Capture the branch's rank AT materialization, from the
            # ordering its own SORT declared — FUSE must not guess it
            # back from _score (a branch sorted by ts ASC would get
            # silently wrong RRF ranks). Fallback for un-sorted scoring
            # branches: ES's own tie-break, _score DESC / _id ASC.
            # Only when a FUSE stage actually consumes the ranks: a
            # plain FORK emits ES|QL's own columns, nothing internal.
            if not fuse_follows:
                order = None
            elif last_sort is not None:
                order = _parse_sort_order(last_sort)
            elif "_score" in b.columns and "_id" in b.columns:
                order = [F.desc("_score"), F.asc("_id")]
            else:
                order = None
            if order is not None:
                # branches feeding FUSE are LIMITed top-k by contract,
                # so the single-partition rank window is query-sized
                b = b.withColumn(
                    "_fork_rank",
                    F.row_number().over(Window.orderBy(*order)),
                )
            outs.append(b.withColumn("_fork", F.lit(f"fork{i}")))
        df = outs[0]
        for b in outs[1:]:
            df = df.unionByName(b, allowMissingColumns=True)
    elif kw == "FUSE":
        # FUSE (9.x tech preview): RRF-combine the FORK branches.
        # Per-branch rank is `_fork_rank`, captured by FORK at branch
        # materialization from the branch's OWN SORT ordering (so a
        # branch sorted by ts ASC fuses with its actual ranks, not a
        # guessed _score order). Fused _score = sum over branches of
        # 1/(60 + rank), grouped by _id (Cormack et al. 2009, the rrf
        # retriever's constant). Output contract: (_id, _score) — ES
        # replaces _score and drops the per-branch rows;
        # project/enrich other columns after FUSE.
        for need in ("_fork", "_id", "_fork_rank"):
            if need not in df.columns:
                raise ValueError(
                    f"ES|QL: FUSE needs a FORK output with {need!r} "
                    "(every FORK branch must be rankable: end it with "
                    "SORT, or emit _score/_id)"
                )
        df = (
            # assert_true: an unranked branch (no SORT, no _score)
            # must fail loudly at execution, not fuse as a no-op
            df.withColumn(
                "_chk",
                F.assert_true(
                    F.col("_fork_rank").isNotNull(),
                    F.lit(
                        "ES|QL: FUSE saw a FORK branch with no rank "
                        "(end every branch with SORT or emit _score)"
                    ),
                ),
            )
            .drop("_chk")
            .groupBy("_id")
            .agg(
                F.round(
                    F.sum(1.0 / (F.lit(60.0) + F.col("_fork_rank"))), 6
                ).alias("_score")
            )
        )
    else:
        raise ValueError(f"ES|QL: unknown command {kw!r}")
    return df
