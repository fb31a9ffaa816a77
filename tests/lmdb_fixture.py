"""Minimal LMDB *writer* — test infrastructure only.

Builds a spec-conformant 64-bit little-endian LMDB data file (the layout
``lmdb.open`` produces and data/lmdb_reader.py consumes) so the ingestion
path can be CI-tested in this image, which has neither the ``lmdb``
package nor liblmdb.  Structs follow the same published layout the reader
documents; tests/test_lmdb_reader.py additionally re-derives the meta
offsets by hand and — whenever the real ``lmdb`` package IS importable —
verifies the pure reader against genuinely lmdb-written files, which
breaks the writer/reader circularity on artifact-day environments.

Not shipped in the package: the framework never writes LMDB (its own
store is ldkv); only ingestion reads it.
"""
from __future__ import annotations

import os
import struct
from typing import Dict, List, Tuple

PSIZE = 4096
_PAGEHDRSZ = 16
_P_BRANCH, _P_LEAF, _P_OVERFLOW, _P_META = 0x01, 0x02, 0x04, 0x08
_F_BIGDATA = 0x01
_P_INVALID = 0xFFFFFFFFFFFFFFFF
# values larger than this go to overflow pages (real lmdb: roughly
# (psize - hdr) / 2 minus node overhead; any threshold <= that is valid
# output for a writer)
_BIG = 1600


def _node_bytes(key: bytes, lo: int, hi: int, flags: int,
                payload: bytes) -> bytes:
    raw = struct.pack("<HHHH", lo, hi, flags, len(key)) + key + payload
    if len(raw) % 2:  # lmdb keeps nodes 2-byte aligned
        raw += b"\x00"
    return raw


def _page(pgno: int, flags: int, nodes: List[bytes]) -> bytes:
    lower = _PAGEHDRSZ + 2 * len(nodes)
    body_len = sum(len(n) for n in nodes)
    upper = PSIZE - body_len
    assert lower <= upper, "page overflow: caller must split"
    buf = bytearray(PSIZE)
    struct.pack_into("<QHHHH", buf, 0, pgno, 0, flags, lower, upper)
    # node bodies pack from the top of the page downward, in insert order
    # (ptr array stays sorted; physical order within the page is free)
    pos = PSIZE
    for i, n in enumerate(nodes):
        pos -= len(n)
        buf[pos:pos + len(n)] = n
        struct.pack_into("<H", buf, _PAGEHDRSZ + 2 * i, pos)
    return bytes(buf)


def _meta_page(pgno: int, txnid: int, main: Dict[str, int]) -> bytes:
    buf = bytearray(PSIZE)
    struct.pack_into("<QHHHH", buf, 0, pgno, 0, _P_META, 0, 0)
    struct.pack_into("<IIQQ", buf, _PAGEHDRSZ, 0xBEEFC0DE, 1, 0, 0)
    db0 = struct.pack("<IHHQQQQQ", PSIZE, 0, 0, 0, 0, 0, 0, _P_INVALID)
    db1 = struct.pack("<IHHQQQQQ", 0, 0, main["depth"],
                      main["branch_pages"], main["leaf_pages"],
                      main["overflow_pages"], main["entries"], main["root"])
    base = _PAGEHDRSZ + 24
    buf[base:base + 48] = db0
    buf[base + 48:base + 96] = db1
    struct.pack_into("<QQ", buf, base + 96, main["last_pg"], txnid)
    return bytes(buf)


def write_lmdb(path: str, items: Dict[bytes, bytes]) -> str:
    """Write {key: value} as <path>/data.mdb; returns the file path."""
    os.makedirs(path, exist_ok=True)
    pairs = sorted(items.items())
    pages: List[bytes] = []  # data pages, pgno = 2 + index
    next_pgno = 2

    def alloc(raw: bytes) -> int:
        nonlocal next_pgno
        assert len(raw) % PSIZE == 0
        pages.append(raw)
        pgno = next_pgno
        next_pgno += len(raw) // PSIZE
        return pgno

    n_overflow = 0
    # ---- leaves ------------------------------------------------------------
    leaves: List[Tuple[bytes, List[bytes]]] = []  # (first key, nodes)
    cur: List[bytes] = []
    cur_first = b""
    cur_size = _PAGEHDRSZ

    def node_for(key: bytes, val: bytes) -> bytes:
        nonlocal n_overflow
        if len(val) > _BIG:
            ovf_pages = -(-(_PAGEHDRSZ + len(val)) // PSIZE)
            raw = bytearray(ovf_pages * PSIZE)
            struct.pack_into("<QHHI", raw, 0, 0, 0, _P_OVERFLOW, ovf_pages)
            raw[_PAGEHDRSZ:_PAGEHDRSZ + len(val)] = val
            ovf_pgno = alloc(bytes(raw))
            struct.pack_into("<Q", raw, 0, ovf_pgno)  # fix pgno in place
            pages[-1] = bytes(raw)
            n_overflow += ovf_pages
            return _node_bytes(key, len(val) & 0xFFFF, len(val) >> 16,
                               _F_BIGDATA, struct.pack("<Q", ovf_pgno))
        return _node_bytes(key, len(val) & 0xFFFF, len(val) >> 16, 0, val)

    for key, val in pairs:
        node = node_for(key, val)
        if cur and cur_size + 2 + len(node) > PSIZE:
            leaves.append((cur_first, cur))
            cur, cur_size = [], _PAGEHDRSZ
        if not cur:
            cur_first = key
        cur.append(node)
        cur_size += 2 + len(node)
    if cur:
        leaves.append((cur_first, cur))

    if not leaves:
        root, depth, n_branch, n_leaf = _P_INVALID, 0, 0, 0
    else:
        level = [(first, alloc(_page(0, _P_LEAF, nodes)))
                 for first, nodes in leaves]
        n_leaf, depth, n_branch = len(level), 1, 0
        # ---- branch levels up to a single root -----------------------------
        while len(level) > 1:
            nxt: List[Tuple[bytes, int]] = []
            group: List[Tuple[bytes, int]] = []
            gsize = _PAGEHDRSZ
            for j, (first, child) in enumerate(level):
                key = b"" if not group else first  # leftmost key is implied
                sz = 2 + 8 + len(key) + (len(key) % 2)
                if group and gsize + sz > PSIZE:
                    nxt.append((group[0][0], _emit_branch(group, alloc)))
                    n_branch += 1
                    group, gsize = [], _PAGEHDRSZ
                    key = b""  # new page: its first key is implied again
                    sz = 2 + 8
                group.append((first if group else first, child))
                gsize += sz
            if group:
                nxt.append((group[0][0], _emit_branch(group, alloc)))
                n_branch += 1
            level = nxt
            depth += 1
        root = level[0][1]

    # fix pgnos inside data pages (alloc wrote placeholders for leaf/branch)
    fixed = []
    pgno = 2
    for raw in pages:
        raw = bytearray(raw)
        struct.pack_into("<Q", raw, 0, pgno)
        fixed.append(bytes(raw))
        pgno += len(raw) // PSIZE
    body = b"".join(fixed)

    main = {"depth": depth, "branch_pages": n_branch, "leaf_pages": n_leaf,
            "overflow_pages": n_overflow, "entries": len(pairs),
            "root": root, "last_pg": next_pgno - 1}
    empty = {"depth": 0, "branch_pages": 0, "leaf_pages": 0,
             "overflow_pages": 0, "entries": 0, "root": _P_INVALID,
             "last_pg": 1}
    out = os.path.join(path, "data.mdb")
    with open(out, "wb") as f:
        f.write(_meta_page(0, 0, empty))
        f.write(_meta_page(1, 1, main))
        f.write(body)
    return out


def _emit_branch(group: List[Tuple[bytes, int]], alloc) -> int:
    nodes = []
    for j, (first, child) in enumerate(group):
        key = b"" if j == 0 else first
        nodes.append(_node_bytes(key, child & 0xFFFF,
                                 (child >> 16) & 0xFFFF,
                                 (child >> 32) & 0xFFFF, b""))
    return alloc(_page(0, _P_BRANCH, nodes))
