"""The README's library-use example must stay executable.

The CLI help blocks are kept in sync by scripts/update_docs.py's drift
gate; this covers the remaining executable documentation the same way the
reference's doc-tests cover bitenc.rs:14-22 (run under cargo test).
"""

from pathlib import Path

README = Path(__file__).resolve().parent.parent / "README.md"


def _python_blocks(text):
    blocks, lines, cur, in_block = [], text.splitlines(), [], False
    for ln in lines:
        if in_block:
            if ln.startswith("```"):
                blocks.append("\n".join(cur))
                cur, in_block = [], False
            else:
                cur.append(ln)
        elif ln.strip() == "```python":
            in_block = True
    return blocks


def test_readme_python_examples_execute():
    blocks = _python_blocks(README.read_text())
    assert blocks, "README lost its ```python example block"
    for block in blocks:
        exec(compile(block, str(README), "exec"), {})
