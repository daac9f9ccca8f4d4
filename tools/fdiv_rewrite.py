#!/usr/bin/env python3
"""Dev tool: rewrite DuckDB `A // B` into the portable
`CAST(floor(A / B) AS BIGINT)` inside oracle SQL embedded in Scala
stripMargin strings. Conservative: only touches `//` on margin (`|`) lines,
skips `//` inside single-quoted SQL strings, and FLAGS (leaves untouched +
reports) any site whose result feeds further multiplicative operators,
where a naive floor-wrap would change grouping.

Floor-chain note: `a // b // c` (ints, positive divisors) equals
floor(a/b/c) by the nested-floor identity, so consecutive `//` with no
other multiplicative operator in between collapse into ONE wrap.

Usage: python3 tools/fdiv_rewrite.py FILE [--apply]
"""
import sys, re

def is_space(s, i):
    # whitespace, including a stripMargin line break: \n spaces |
    return s[i] in " \t" or (s[i] == "\n")

def skip_ws_fwd(s, i):
    while i < len(s):
        if s[i] in " \t":
            i += 1
        elif s[i] == "\n":
            j = i + 1
            while j < len(s) and s[j] in " \t":
                j += 1
            if j < len(s) and s[j] == "|":
                i = j + 1
            else:
                return i  # newline not followed by margin: stop (string end)
        else:
            return i
    return i

def skip_ws_back(s, i):
    # i points just past the char to inspect; returns index just past last
    # non-ws char scanning backwards, treating "\n  |" as whitespace
    while i > 0:
        c = s[i - 1]
        if c in " \t":
            i -= 1
        elif c == "|":
            # margin bar only if preceded by newline+spaces
            j = i - 1
            while j > 0 and s[j - 1] in " \t":
                j -= 1
            if j > 0 and s[j - 1] == "\n":
                i = j - 1
            else:
                return i
        elif c == "\n":
            i -= 1
        else:
            return i
    return i

IDENT = re.compile(r"[A-Za-z0-9_.\$]")

def scan_operand_back(s, i):
    """i = index just past operand end (ws already skipped). Return start."""
    i0 = skip_ws_back(s, i)
    c = s[i0 - 1]
    if c == ")":
        depth = 0
        j = i0
        while j > 0:
            ch = s[j - 1]
            if ch == "'":
                # skip back over string literal
                j -= 1
                while j > 0 and s[j - 1] != "'":
                    j -= 1
                j -= 1
                continue
            if ch == ")":
                depth += 1
            elif ch == "(":
                depth -= 1
                if depth == 0:
                    j -= 1
                    break
            j -= 1
        # include a preceding function name ONLY if it abuts the paren —
        # `sum(x)` is a call, `THEN (x)` / `SELECT (x)` are keyword + expr
        m = j
        while m > 0 and IDENT.match(s[m - 1]):
            m -= 1
        if m < j:
            j = m
        return j
    if c == "'":
        j = i0 - 1
        while j > 0 and s[j - 1] != "'":
            j -= 1
        return j - 1
    # identifier / number
    j = i0
    while j > 0 and IDENT.match(s[j - 1]):
        j -= 1
    return j

def scan_operand_fwd(s, i):
    """i = operand start (ws skipped). Return index just past operand end."""
    i = skip_ws_fwd(s, i)
    c = s[i]
    if c == "(":
        depth = 0
        j = i
        while j < len(s):
            ch = s[j]
            if ch == "'":
                j += 1
                while j < len(s) and s[j] != "'":
                    j += 1
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    return j + 1
            j += 1
        return j
    if c == "-" or c == "+":
        return scan_operand_fwd(s, i + 1)
    j = i
    while j < len(s) and IDENT.match(s[j]):
        j += 1
    # function call? only when the paren abuts the identifier
    if j < len(s) and s[j] == "(" and j > i:
        return scan_operand_fwd(s, j)
    return j

def in_sql_string(line_prefix):
    """crude: `//` is SQL only if the line (up to the match) is a margin
    line — starts with optional ws then |, or is inside a single-line
    triple-quote SQL start. We only auto-handle margin lines."""
    st = line_prefix.lstrip()
    return st.startswith("|") or st.startswith('"""')

def main(path, apply_):
    s = open(path).read()
    out = []
    flagged = []
    edits = []  # (start, end, replacement)
    i = 0
    while True:
        i = s.find("//", i)
        if i < 0:
            break
        # line context
        ls = s.rfind("\n", 0, i) + 1
        if not in_sql_string(s[ls:i]):
            i += 2
            continue
        # inside single-quoted sql string or a double-quoted Scala
        # interpolation argument? count quotes from line start
        if s[ls:i].count("'") % 2 == 1 or s[ls:i].count('"') % 2 == 1:
            i += 2
            continue
        # left operand: could itself be a multiplicative chain — extend
        lstart = i
        while True:
            lstart_new = scan_operand_back(s, lstart)
            k = skip_ws_back(s, lstart_new)
            # preceding multiplicative operator binds into the left chain
            prev2 = s[max(0, k - 2):k]
            if prev2.endswith("*") or (prev2.endswith("/") and not prev2.endswith("//")) or prev2.endswith("%"):
                lstart = k - 1
                continue
            if prev2 == "//":
                flagged.append((i, "// on the left — collapse manually"))
                lstart_new = None
            break
        if lstart_new is None:
            i += 2
            continue
        lstart = skip_ws_fwd(s, lstart_new)
        # right operand(s): handle consecutive `//` chain
        j = i
        while True:
            rend = scan_operand_fwd(s, j + 2)
            k = skip_ws_fwd(s, rend)
            if s[k:k + 2] == "//":
                j = k  # nested floor: keep collapsing
                continue
            if k < len(s) and s[k] in "*%":
                flagged.append((i, f"feeds `{s[k]}` — manual"))
                rend = None
            elif k < len(s) and s[k] == "/" and s[k:k+2] != "//":
                flagged.append((i, "feeds `/` — manual"))
                rend = None
            break
        if rend is None:
            i += 2
            continue
        body = s[lstart:rend].replace("//", "/")
        edits.append((lstart, rend, f"CAST(floor({body}) AS BIGINT)"))
        i = rend
    for (a, b, r) in reversed(edits):
        s = s[:a] + r + s[b:]
    print(f"{path}: {len(edits)} rewrites, {len(flagged)} flagged")
    orig = open(path).read()
    for (pos, why) in flagged:
        print(f"  FLAG line {orig[:pos].count(chr(10)) + 1}: {why}")
    if apply_:
        open(path, "w").write(s)

if __name__ == "__main__":
    main(sys.argv[1], "--apply" in sys.argv)
