"""Identifier safety for parameterized column names.

Operators that take a column-name parameter (``id_col=...``) refer to
it in string-ref contexts — ``F.col(name)``, ``select(name)``,
``groupBy(name)``, alias-qualified ``F.col(f"a.{name}")`` — where Spark
PARSES the string: a name containing a dot resolves as a nested field
and one containing a space doesn't parse at all, even though the
DataFrame accepted the same name at creation (ADVICE r10).
``quote_ident`` backtick-quotes the name (escaping embedded backticks
the Spark way, doubling them) so the ref always means the one column.
"""

from __future__ import annotations


def quote_ident(name: str) -> str:
    """Backtick-quote a column name for string-ref contexts."""
    return "`" + name.replace("`", "``") + "`"
