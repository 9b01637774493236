"""Minimal LMDB environment *writer* used only to build test fixtures.

The production code is read-only (diffpure_tpu/data/lmdb_reader.py); this
writer exists because neither the ``lmdb`` binding nor ``liblmdb`` is
available to generate golden files. It emits the standard on-disk format
(same layout the reader documents), packing a static B+tree bottom-up:
sorted leaves, separator branches, overflow pages for large values, and
two meta pages (txnid 0 = empty, txnid 1 = the committed tree) so the
reader's newest-meta selection is exercised.
"""
from __future__ import annotations

import os
import struct
from typing import Dict, List, Tuple

PSIZE = 4096
PAGEHDRSZ = 16
NODESZ = 8
MAGIC = 0xBEEFC0DE
P_BRANCH, P_LEAF, P_OVERFLOW, P_META = 0x01, 0x02, 0x04, 0x08
F_BIGDATA = 0x01
P_INVALID = 0xFFFFFFFFFFFFFFFF
# lmdb puts data on overflow pages when the node would exceed mn_max
# (~psize/2); any threshold below that bound produces valid files.
INLINE_MAX = 1600


def _even(n: int) -> int:
    return n + (n & 1)


def _page_header(pgno: int, flags: int, lower: int, upper: int) -> bytes:
    return struct.pack("<QHHHH", pgno, 0, flags, lower, upper)


def _overflow_header(pgno: int, n_pages: int) -> bytes:
    return struct.pack("<QHHI", pgno, 0, P_OVERFLOW, n_pages)


class _PageAlloc:
    def __init__(self):
        self.pages: List[bytes] = [b"", b""]  # metas filled in last

    def add(self, payload: bytes) -> int:
        pgno = len(self.pages)
        assert len(payload) <= PSIZE
        self.pages.append(payload.ljust(PSIZE, b"\0"))
        return pgno

    def add_raw(self, chunks: List[bytes]) -> int:
        pgno = len(self.pages)
        self.pages.extend(c.ljust(PSIZE, b"\0") for c in chunks)
        return pgno


def _pack_nodes(pgno: int, flags: int, nodes: List[bytes]) -> bytes:
    """Lay nodes on one page: ptr array grows up from 16, nodes grow down."""
    lower = PAGEHDRSZ + 2 * len(nodes)
    upper = PSIZE
    page = bytearray(PSIZE)
    ptrs = []
    for node in nodes:
        upper -= _even(len(node))
        assert upper >= lower, "page overflow in fixture writer"
        page[upper:upper + len(node)] = node
        ptrs.append(upper)
    page[:PAGEHDRSZ] = _page_header(pgno, flags, lower, upper)
    for i, p in enumerate(ptrs):
        struct.pack_into("<H", page, PAGEHDRSZ + 2 * i, p)
    return bytes(page)


def _leaf_node(key: bytes, dsize: int, flags: int, payload: bytes) -> bytes:
    return struct.pack("<HHHH", dsize & 0xFFFF, dsize >> 16, flags,
                       len(key)) + key + payload


def _branch_node(key: bytes, pgno: int) -> bytes:
    return struct.pack("<HHHH", pgno & 0xFFFF, (pgno >> 16) & 0xFFFF,
                       (pgno >> 32) & 0xFFFF, len(key)) + key


def _db_record(depth: int, branch: int, leaf: int, ovf: int, entries: int,
               root: int, pad: int = 0) -> bytes:
    return struct.pack("<IHHQQQQQ", pad, 0, depth, branch, leaf, ovf,
                       entries, root)


def _meta_page(pgno: int, main_db: bytes, last_pg: int, txnid: int,
               mapsize: int) -> bytes:
    free_db = _db_record(0, 0, 0, 0, 0, P_INVALID, pad=PSIZE)
    body = struct.pack("<IIQQ", MAGIC, 1, 0, mapsize) + free_db + main_db \
        + struct.pack("<QQ", last_pg, txnid)
    return (_page_header(pgno, P_META, 0, 0) + body).ljust(PSIZE, b"\0")


def write_lmdb(path: str, entries: Dict[bytes, bytes]) -> str:
    """Write ``entries`` as an LMDB environment directory; returns the dir."""
    os.makedirs(path, exist_ok=True)
    alloc = _PageAlloc()
    items = sorted(entries.items())
    n_overflow = 0

    # leaves (overflow chunks allocated inline, as lmdb does mid-txn)
    leaf_pages: List[Tuple[bytes, int]] = []  # (first key, pgno)
    pending: List[bytes] = []
    pending_size = PAGEHDRSZ
    pending_first: bytes = b""

    def flush_leaf():
        nonlocal pending, pending_size, pending_first
        if not pending:
            return
        pgno = len(alloc.pages)
        alloc.add(_pack_nodes(pgno, P_LEAF, pending))
        leaf_pages.append((pending_first, pgno))
        pending, pending_size = [], PAGEHDRSZ

    for key, value in items:
        if NODESZ + len(key) + len(value) > INLINE_MAX:
            n_chunks = -(-(PAGEHDRSZ + len(value)) // PSIZE)
            chunks = []
            data = value
            for ci in range(n_chunks):
                if ci == 0:
                    head = _overflow_header(len(alloc.pages), n_chunks)
                    chunks.append(head + data[:PSIZE - PAGEHDRSZ])
                    data = data[PSIZE - PAGEHDRSZ:]
                else:
                    chunks.append(data[:PSIZE])
                    data = data[PSIZE:]
            ovf_pgno = alloc.add_raw(chunks)
            n_overflow += n_chunks
            node = _leaf_node(key, len(value), F_BIGDATA,
                              struct.pack("<Q", ovf_pgno))
        else:
            node = _leaf_node(key, len(value), 0, value)
        need = 2 + _even(len(node))
        if pending_size + need > PSIZE:
            flush_leaf()
        if not pending:
            pending_first = key
        pending.append(node)
        pending_size += need
    flush_leaf()

    # branch levels up to a single root
    level: List[Tuple[bytes, int]] = leaf_pages
    n_branch = 0
    depth = 1 if leaf_pages else 0
    while len(level) > 1:
        nxt: List[Tuple[bytes, int]] = []
        group: List[bytes] = []
        gsize = PAGEHDRSZ
        gfirst: bytes = b""
        for i, (first_key, child) in enumerate(level):
            key = b"" if not group else first_key   # node 0: implicit -inf
            node = _branch_node(key, child)
            need = 2 + _even(len(node))
            if gsize + need > PSIZE and group:
                pgno = len(alloc.pages)
                alloc.add(_pack_nodes(pgno, P_BRANCH, group))
                nxt.append((gfirst, pgno))
                n_branch += 1
                group, gsize = [], PAGEHDRSZ
                node = _branch_node(b"", child)
                need = 2 + _even(len(node))
            if not group:
                gfirst = first_key
            group.append(node)
            gsize += need
        if group:
            pgno = len(alloc.pages)
            alloc.add(_pack_nodes(pgno, P_BRANCH, group))
            nxt.append((gfirst, pgno))
            n_branch += 1
        level = nxt
        depth += 1

    root = level[0][1] if level else P_INVALID
    last_pg = len(alloc.pages) - 1
    mapsize = len(alloc.pages) * PSIZE
    empty_db = _db_record(0, 0, 0, 0, 0, P_INVALID)
    main_db = _db_record(depth, n_branch, len(leaf_pages), n_overflow,
                         len(items), root)
    alloc.pages[0] = _meta_page(0, empty_db, 1, 0, mapsize)
    alloc.pages[1] = _meta_page(1, main_db, last_pg, 1, mapsize)

    with open(os.path.join(path, "data.mdb"), "wb") as f:
        for page in alloc.pages:
            f.write(page)
    return path
