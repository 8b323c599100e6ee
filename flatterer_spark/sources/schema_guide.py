"""JSONSchema-guided field ordering and titles (F12).

Reference: ``--schema`` orders fields per a JSONSchema (local or remote,
``$ref``-dereferenced); ``--schema-titles full|slug|underscore_slug`` renames
field titles from schema ``title`` properties
(`/root/reference/docs/options.md:663-756`; jsonref dep `Cargo.lock:2372`,
slug dep `Cargo.lock:4051`).

``$ref`` resolution covers the full jsonref surface: local ``#/...``
pointers, absolute ``http(s)://`` refs, and relative refs (resolved against
the referencing document's own URL/path, so a remote document's internal
refs fetch from its host).  Fetched documents are cached per call -- a
schema referencing one remote vocabulary N times costs one request.  The
schema path itself may be local or remote; remote fetches ride the same
urllib path as HTTP data inputs (json_input._stage_input).
"""

from __future__ import annotations

import json
import re
from urllib.parse import urljoin


def _fetch_doc(url_or_path: str, cache: dict[str, dict]) -> dict:
    if url_or_path not in cache:
        if url_or_path.startswith(("http://", "https://")):
            import urllib.request

            with urllib.request.urlopen(url_or_path) as resp:
                cache[url_or_path] = json.loads(resp.read())
        else:
            with open(url_or_path) as f:
                cache[url_or_path] = json.load(f)
    return cache[url_or_path]


def _json_pointer(doc: dict, frag: str) -> dict:
    node = doc
    for part in frag.lstrip("/").split("/") if frag.lstrip("/") else []:
        node = node[part.replace("~1", "/").replace("~0", "~")]
    return node


def schema_key_order_and_titles(
    schema_path: str,
) -> tuple[dict[tuple[str, ...], list[str]], dict[tuple[str, ...], str]]:
    """Walk a JSONSchema -> ({path: ordered keys}, {field path: title}).

    ``schema_path`` may be a local file or an http(s) URL.
    """
    cache: dict[str, dict] = {}
    root = _fetch_doc(schema_path, cache)

    order: dict[tuple[str, ...], list[str]] = {}
    titles: dict[tuple[str, ...], str] = {}

    def deref(node, doc: dict, base: str, depth: int = 0):
        """Follow $ref chains; returns (node, owning doc, owning base URL) so
        a remote document's internal refs keep resolving against it."""
        while isinstance(node, dict) and "$ref" in node and depth <= 32:
            ref = node["$ref"]
            url, _, frag = ref.partition("#")
            if url:
                target = urljoin(base, url)
                doc, base = _fetch_doc(target, cache), target
                node = _json_pointer(doc, frag)
            else:
                node = _json_pointer(doc, frag)
            depth += 1
        return node, doc, base

    def walk(node, doc: dict, base: str, at: tuple[str, ...], depth: int = 0) -> None:
        # Recursive-schema guard: an explicit depth counter bounds EVERY
        # recursion path.  len(at) alone is insufficient -- the array/items
        # branch recurses with the same `at`, so a schema self-referential
        # purely through items ({"type":"array","items":{"$ref":"#"}}) would
        # otherwise recurse unboundedly.
        if depth > 64 or len(at) > 32:
            return
        node, doc, base = deref(node, doc, base)
        if not isinstance(node, dict):
            return
        if node.get("type") == "array" or "items" in node:
            walk(node.get("items", {}), doc, base, at, depth + 1)
            return
        props = node.get("properties")
        if not isinstance(props, dict):
            return
        order[at] = list(props.keys())
        for k, sub in props.items():
            sub, sdoc, sbase = deref(sub if isinstance(sub, dict) else {}, doc, base)
            if isinstance(sub, dict) and "title" in sub:
                titles[at + (k,)] = sub["title"]
            walk(sub, sdoc, sbase, at + (k,), depth + 1)

    walk(root, root, schema_path, ())
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
