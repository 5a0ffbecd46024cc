"""Reference-parity command parser.

Reproduces the ``RAINSTORM <op1> <op2> <hydfs_file> <numTasks>`` command
surface: the quote-aware lexer (``Node.java:355-382``) and the
string→operator factory (``Node.java:402-486``), but compiling to
:mod:`.core` DataFrame transforms instead of the reference's
tuple-interpreter IR (``Operators.java:73-110``).  Unlike the reference,
a pipeline may chain any number of operators, not exactly two.
"""

from __future__ import annotations

from dataclasses import dataclass

from . import core
from .core import Transform


def parse_operation_string(command: str) -> list[str]:
    """Quote-aware tokenizer (parity with ``Node.java:355-382``):
    whitespace splits tokens except inside double quotes; quotes are
    retained on the token (stripped later by the operator ctor, as the
    reference does in ``Operators.java:121-144``)."""
    tokens: list[str] = []
    cur: list[str] = []
    in_quotes = False
    for ch in command:
        if ch == '"':
            in_quotes = not in_quotes
            cur.append(ch)
        elif ch.isspace() and not in_quotes:
            if cur:
                tokens.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
    if cur:
        tokens.append("".join(cur))
    return tokens


_TRANSFORMS = {
    "uppercase": core.transform_upper,
    "lowercase": core.transform_lower,
    "trim": core.transform_trim,
    "splitintowords": core.split_into_words,
}


def create_operator(spec: str, line_col: str = core.LINE_COL) -> Transform:
    """String→operator factory (parity with ``Node.java:402-486``).

    Accepted forms (the reference's five shapes, with the
    advertised-but-unbuilt AGGREGATE generalization implemented):

    - ``FILTER:<pattern>``
    - ``COLUMN_FILTER:<column>:<value>``
    - ``TRANSFORM:uppercase|lowercase|trim|splitintowords``
    - ``TRANSFORM:select:<c1,c2,...>``
    - ``FILTERED_TRANSFORM:<pattern>:<transform>``
    - ``AGGREGATE`` (running count, ``Node.java:475-477``)
    - ``AGGREGATE:<count|sum|max|min|avg>:<field>[:by=<k1,k2>]``
    """
    spec = spec.strip().strip('"')
    parts = spec.split(":")
    kind = parts[0].upper()

    if kind == "FILTER":
        if len(parts) < 2:
            raise ValueError(f"FILTER needs a pattern: {spec!r}")
        return core.filter_contains(":".join(parts[1:]), col=line_col)

    if kind == "COLUMN_FILTER":
        if len(parts) != 3:
            raise ValueError(f"COLUMN_FILTER:<column>:<value>, got {spec!r}")
        return core.column_filter(parts[1], parts[2])

    if kind == "TRANSFORM":
        if len(parts) < 2:
            raise ValueError(f"TRANSFORM needs a kind: {spec!r}")
        tkind = parts[1].lower()
        if tkind == "select":
            if len(parts) != 3:
                raise ValueError(f"TRANSFORM:select:<cols>, got {spec!r}")
            cols = [c.strip() for c in parts[2].split(",") if c.strip()]
            return core.select_columns(*cols)
        if tkind in _TRANSFORMS:
            return _TRANSFORMS[tkind](col=line_col)
        # unknown transform rejected, parity with Node.java:461-464
        raise ValueError(f"unknown transform {tkind!r}")

    if kind == "FILTERED_TRANSFORM":
        if len(parts) < 3:
            raise ValueError(f"FILTERED_TRANSFORM:<pattern>:<transform>, got {spec!r}")
        inner = create_operator("TRANSFORM:" + ":".join(parts[2:]), line_col=line_col)
        return core.filtered_transform(parts[1], inner, col=line_col)

    if kind == "AGGREGATE":
        if len(parts) == 1:
            return core.aggregate("count", alias="count")
        fn = parts[1].lower()
        field = parts[2] if len(parts) > 2 and parts[2] else None
        keys: tuple[str, ...] = ()
        if len(parts) > 3:
            # a malformed grouping segment must ERROR, not silently
            # fall back to a global aggregate (r5 review catch:
            # `AGGREGATE:sum:price:key=region` returned one global sum)
            if not parts[3].startswith("by="):
                raise ValueError(
                    f"AGGREGATE grouping must be 'by=<cols>', got {parts[3]!r}"
                )
            if len(parts) > 4:
                raise ValueError(
                    f"AGGREGATE takes at most 4 segments, got {len(parts)}"
                )
            keys = tuple(k.strip() for k in parts[3][3:].split(",") if k.strip())
        return core.aggregate(fn, field, keys)

    raise ValueError(f"unknown operator kind {kind!r}")


@dataclass(frozen=True)
class RainstormCommand:
    operators: tuple[Transform, ...]
    input_file: str
    num_tasks: int


def parse_command(command: str, line_col: str = core.LINE_COL) -> RainstormCommand:
    """Parse a full ``RAINSTORM <op>... <file> <numTasks>`` command
    (syntax parity with ``RainStorm.java:924-979`` / ``Node.java:281-353``,
    generalized from exactly-2 to N operators)."""
    tokens = parse_operation_string(command)
    if not tokens or tokens[0].upper() != "RAINSTORM":
        raise ValueError("command must start with RAINSTORM")
    if len(tokens) < 4:
        raise ValueError("RAINSTORM <op1> [... opN] <file> <numTasks>")
    # len(tokens) >= 4 guarantees ops is non-empty after unpacking
    *ops, input_file, num_tasks = tokens[1:]
    transforms = tuple(create_operator(o, line_col=line_col) for o in ops)
    # the tokenizer is quote-tolerant for every token: strip quotes from
    # numTasks too, not only the filename (r5 review catch)
    try:
        n_tasks = int(num_tasks.strip('"'))
    except ValueError:
        raise ValueError(f"numTasks must be an integer, got {num_tasks!r}") from None
    return RainstormCommand(transforms, input_file.strip('"'), n_tasks)


def run_command(spark, command: str):
    """End-to-end parity entry: parse, read the text file with provenance
    (tuple model, ``Node.java:907-913``), apply the pipeline.  The
    ``numTasks`` knob maps to a repartition of the scan — on Spark this
    is normally left to the scheduler; honored here for parity."""
    from ..sources.readers import read_text_lines

    cmd = parse_command(command)
    df = read_text_lines(spark, cmd.input_file)
    if cmd.num_tasks > 0:
        df = df.repartition(cmd.num_tasks)
    return core.pipe(*cmd.operators)(df)
