"""Docs stay runnable: execute the README's python code blocks (sizes
shrunk via a light rewrite so CI stays fast). Guards against doc rot —
the reference's doctests play the same role (Makefile `make test` runs
cargo doctests)."""

import pathlib
import re


def _python_blocks(path):
    text = pathlib.Path(path).read_text()
    return re.findall(r"```python\n(.*?)```", text, flags=re.S)


def test_readme_python_blocks_execute():
    repo = pathlib.Path(__file__).resolve().parent.parent
    blocks = _python_blocks(repo / "README.md")
    assert blocks, "README has no python examples?"
    ns: dict = {}
    for block in blocks:
        # shrink the demo sizes: the semantics are what's under test
        block = block.replace("1 << 20", "1 << 8")
        exec(compile(block, "README.md", "exec"), ns)
    # the quick-start defined and verified a proof
    assert "proof" in ns


def test_migration_guide_code_snippets_name_check():
    """Every `twenty_first_tpu...` dotted name mentioned in MIGRATION.md
    resolves (the guide was built by introspection; keep it that way)."""
    import importlib

    repo = pathlib.Path(__file__).resolve().parent.parent
    text = (repo / "MIGRATION.md").read_text()
    for mod_name in sorted(set(re.findall(
            r"`(twenty_first_tpu(?:\.\w+)+)`", text))):
        parts = mod_name.split(".")
        # try progressively shorter prefixes as the importable module
        for cut in range(len(parts), 0, -1):
            try:
                obj = importlib.import_module(".".join(parts[:cut]))
                break
            except ImportError:
                continue
        else:
            raise AssertionError(f"{mod_name} does not import")
        for attr in parts[cut:]:
            obj = getattr(obj, attr)  # raises AttributeError on rot
