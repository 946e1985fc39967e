r"""Query parameter binding.

The reference binds CLI-supplied strings as positional ODBC ``?`` parameters
(reference src/query.rs:63-66, src/main.rs:226-234) and, for the ``exec``
subcommand, parses *named* ``?col?`` placeholders into positional ones with
backslash escaping (reference src/execute.rs:64-109). Here:

- positional ``?`` goes straight to ``spark.sql(query, args=[...])`` —
  Spark 4's parameterized SQL binds server-side, injection-safe, exactly the
  reference's semantics.
- named ``?col?`` placeholders are parsed by :func:`to_positional` below
  (fresh Python implementation of the documented grammar), yielding the
  rewritten statement plus the ordered parameter-name list; one source column
  may feed several placeholders (reference tests/integration.rs:3882).

Grammar (from the reference's README + behavior): a placeholder is
``?name?`` where ``name`` is anything up to the closing ``?``; a backslash
escapes the next character, so ``\?`` is a literal question mark and ``\\``
a literal backslash — both inside and outside placeholders.
"""

from __future__ import annotations


class PlaceholderError(ValueError):
    pass


def to_positional(statement: str) -> tuple[str, list[str]]:
    """Rewrite ``?name?`` placeholders to positional ``?``.

    Returns ``(rewritten_statement, names)`` where ``names[i]`` is the column
    bound to the i-th positional parameter. Raises :class:`PlaceholderError`
    on an unterminated placeholder or a dangling escape.
    """
    out: list[str] = []
    names: list[str] = []
    i, n = 0, len(statement)
    while i < n:
        ch = statement[i]
        if ch == "\\":
            if i + 1 >= n:
                raise PlaceholderError("dangling backslash escape at end of statement")
            out.append(statement[i + 1])
            i += 2
        elif ch == "?":
            j = i + 1
            name_chars: list[str] = []
            while j < n:
                cj = statement[j]
                if cj == "\\":
                    if j + 1 >= n:
                        raise PlaceholderError("dangling backslash escape inside placeholder")
                    name_chars.append(statement[j + 1])
                    j += 2
                elif cj == "?":
                    break
                else:
                    name_chars.append(cj)
                    j += 1
            if j >= n:
                raise PlaceholderError(
                    f"unterminated placeholder starting at offset {i}: {statement[i:i+20]!r}"
                )
            names.append("".join(name_chars))
            out.append("?")
            i = j + 1
        else:
            out.append(ch)
            i += 1
    return "".join(out), names


def quote_identifier(name: str, style: str = "ansi") -> str:
    """Injection-safe identifier quoting.

    ``ansi`` (double quotes) is what DBAPI targets speak (DuckDB,
    PostgreSQL, SQLite); ``backtick`` is the Spark SQL/MySQL dialect. The
    reference interpolates table/column names into generated INSERT
    statements with no protection (reference src/main.rs:258-261,
    src/insert.rs:55-66); SURVEY §2.3 flags this as a thing to do better.
    """
    if style == "backtick":
        return "`" + name.replace("`", "``") + "`"
    return '"' + name.replace('"', '""') + '"'
