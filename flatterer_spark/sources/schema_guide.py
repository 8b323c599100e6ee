"""JSONSchema-guided field ordering and titles (F12).

Reference: ``--schema`` orders fields per a JSONSchema (local or remote,
``$ref``-dereferenced); ``--schema-titles full|slug|underscore_slug`` renames
field titles from schema ``title`` properties
(`/root/reference/docs/options.md:663-756`; jsonref dep `Cargo.lock:2372`,
slug dep `Cargo.lock:4051`).

Local-document ``#/...`` refs are resolved here; remote HTTP refs would need
network access and raise a clear error instead.
"""

from __future__ import annotations

import json
import re


def _resolve_ref(doc: dict, ref: str) -> dict:
    if not ref.startswith("#/"):
        raise ValueError(f"remote $ref not supported offline: {ref}")
    node = doc
    for part in ref[2:].split("/"):
        node = node[part.replace("~1", "/").replace("~0", "~")]
    return node


def _deref(doc: dict, node: dict, depth: int = 0) -> dict:
    if depth > 32:
        return node
    while isinstance(node, dict) and "$ref" in node:
        node = _resolve_ref(doc, node["$ref"])
        depth += 1
    return node


def schema_key_order_and_titles(
    schema_path: str,
) -> tuple[dict[tuple[str, ...], list[str]], dict[tuple[str, ...], str]]:
    """Walk a JSONSchema -> ({path: ordered keys}, {field path: title})."""
    with open(schema_path) as f:
        doc = json.load(f)

    order: dict[tuple[str, ...], list[str]] = {}
    titles: dict[tuple[str, ...], str] = {}

    def walk(node: dict, at: tuple[str, ...]) -> None:
        node = _deref(doc, node)
        if node.get("type") == "array" or "items" in node:
            walk(node.get("items", {}), at)
            return
        props = node.get("properties")
        if not isinstance(props, dict):
            return
        order[at] = list(props.keys())
        for k, sub in props.items():
            sub = _deref(doc, sub if isinstance(sub, dict) else {})
            if "title" in sub:
                titles[at + (k,)] = sub["title"]
            walk(sub, at + (k,))

    walk(doc, ())
    return order, titles


def slugify(title: str, underscore: bool = False) -> str:
    s = re.sub(r"[^A-Za-z0-9]+", "-", title).strip("-").lower()
    return s.replace("-", "_") if underscore else s


def apply_schema_titles(
    titles: dict[tuple[str, ...], str], mode: str, path_separator: str = "_"
) -> dict[str, str]:
    """field-path titles -> {flattened column name: rendered title}."""
    out = {}
    for path, title in titles.items():
        col = path_separator.join(path)
        if mode == "full":
            out[col] = title
        elif mode == "slug":
            out[col] = slugify(title)
        elif mode == "underscore_slug":
            out[col] = slugify(title, underscore=True)
        else:
            raise ValueError(f"unknown schema_titles mode: {mode}")
    return out
