"""Registry-source hygiene: duplicate dict-literal keys are silent
last-writer-wins overrides in Python — a new query accidentally reusing
an existing name would shadow the old query AND its oracle without any
error (it happened in round 7: a new orders cube briefly clobbered the
lineitem ``revenue_cube``). This gate parses the module's AST and fails
on any duplicated literal key in ``_all_queries`` / ``oracle_sql``.
"""

import ast
from collections import Counter


def _literal_keys(func_node):
    keys = []
    for node in ast.walk(func_node):
        if isinstance(node, ast.Dict):
            for k in node.keys:
                if isinstance(k, ast.Constant) and isinstance(k.value, str):
                    keys.append(k.value)
    return keys


def test_no_duplicate_registry_keys():
    tree = ast.parse(open("/root/repo/__spark_entry__.py").read())
    funcs = {
        n.name: n
        for n in tree.body
        if isinstance(n, ast.FunctionDef)
        and n.name in ("_all_queries", "oracle_sql")
    }
    assert set(funcs) == {"_all_queries", "oracle_sql"}
    for name, node in funcs.items():
        dupes = [k for k, c in Counter(_literal_keys(node)).items() if c > 1]
        assert not dupes, f"duplicate keys in {name}: {dupes}"
