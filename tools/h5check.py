#!/usr/bin/env python3
"""Independent HDF5 conformance validator for the classic-format subset
graft's SONATA sink emits.

Written field-by-field from the public HDF5 File Format Specification
(the hdfgroup.org "HDF5 File Format Specification Version 3.0" document;
section numbers cited per check: II.A = "Disk Format: Level 0A - Format
Signature and Superblock", III.A.1 = v1 B-trees, III.B = symbol table
nodes, III.D = local heaps, IV.A.1.a = v1 object headers, IV.A.2.x =
header messages). This tool deliberately shares NO code, structure, or
derivation with the Scala codec under test (graft.io.Hdf5Mini): it is a
second, independent reading of the spec, so a deviation that round-trips
through the codec's own reader still fails here unless both
implementations made the same mistake independently.

Subset validated (anything outside it FAILS — strictness is the point):
  - superblock version 0, 8-byte offsets/lengths, base address 0 (II.A)
  - classic symbol-table groups: v1 group B-trees (III.A.1), SNODs
    (III.B), local heaps (III.D)
  - version-1 object headers (IV.A.1.a) with messages: NIL (IV.A.2.a),
    dataspace v1 (IV.A.2.b), datatype classes fixed-point/float/string
    (IV.A.2.d), fill value v2 (IV.A.2.f), contiguous layout v3
    (IV.A.2.i), attribute v1 (IV.A.2.m), symbol table (IV.A.2.r),
    object modification time (IV.A.2.s)
  - cross-checks: dataset byte size == product(dims) x element size;
    B-tree key ordering against heap link names; SNOD entries sorted;
    all metadata/data extents within EOF and mutually non-overlapping.

Usage: python3 tools/h5check.py FILE [--quiet]
Exit 0 iff conformant; every failure prints its spec citation.
"""
import struct
import sys

UNDEF = 0xFFFFFFFFFFFFFFFF


class H5Fail(Exception):
    pass


def fail(cite, msg):
    raise H5Fail("[%s] %s" % (cite, msg))


def expect(cond, cite, msg):
    if not cond:
        fail(cite, msg)


class Checker:
    def __init__(self, data, file_size):
        self.d = data
        self.file_size = file_size
        self.extents = []      # (start, end, label) for the overlap sweep
        self.checks = 0
        self.groups = 0
        self.datasets = {}     # path -> (addr, size, dims, elem_size)
        self.leaf_k = 0
        self.internal_k = 0
        self.eof = 0

    # ---- primitive readers -------------------------------------------
    def u8(self, off):
        return self.d[off]

    def u16(self, off):
        return struct.unpack_from("<H", self.d, off)[0]

    def u32(self, off):
        return struct.unpack_from("<I", self.d, off)[0]

    def u64(self, off):
        return struct.unpack_from("<Q", self.d, off)[0]

    def claim(self, start, end, label):
        expect(0 <= start <= end <= self.eof, "II.A",
               "%s extent [%d,%d) outside file (eof %d)" % (label, start, end, self.eof))
        self.extents.append((start, end, label))

    def ok(self, cond, cite, msg):
        self.checks += 1
        expect(cond, cite, msg)

    # ---- level 0: superblock (spec II.A) -----------------------------
    def superblock(self):
        d = self.d
        self.ok(d[0:8] == b"\x89HDF\r\n\x1a\n", "II.A", "bad format signature")
        self.ok(d[8] == 0, "II.A", "superblock version %d (subset: 0)" % d[8])
        self.ok(d[9] == 0, "II.A", "free-space storage version %d != 0" % d[9])
        self.ok(d[10] == 0, "II.A", "root symbol-table version %d != 0" % d[10])
        self.ok(d[11] == 0, "II.A", "reserved byte 11 != 0")
        self.ok(d[12] == 0, "II.A", "shared-header-message version %d != 0" % d[12])
        self.ok(d[13] == 8, "II.A", "size of offsets %d (subset: 8)" % d[13])
        self.ok(d[14] == 8, "II.A", "size of lengths %d (subset: 8)" % d[14])
        self.ok(d[15] == 0, "II.A", "reserved byte 15 != 0")
        self.leaf_k = self.u16(16)
        self.internal_k = self.u16(18)
        self.ok(self.leaf_k > 0, "II.A", "group leaf node K must be > 0")
        self.ok(self.internal_k > 0, "II.A", "group internal node K must be > 0")
        self.ok(self.u32(20) == 0, "II.A", "file consistency flags != 0")
        self.ok(self.u64(24) == 0, "II.A", "base address %d (subset: 0)" % self.u64(24))
        self.ok(self.u64(32) == UNDEF, "II.A", "free-space info address must be undefined")
        self.eof = self.u64(40)
        self.ok(self.eof == self.file_size, "II.A",
                "EOF address %d != file size %d" % (self.eof, self.file_size))
        self.ok(self.u64(48) == UNDEF, "II.A", "driver info block (subset: none)")
        self.claim(0, 96, "superblock")
        # root group symbol table entry (II.A embeds a III.C entry)
        self.ok(self.u64(56) == 0, "III.C", "root STE link name offset != 0")
        root_oh = self.u64(64)
        cache = self.u32(72)
        self.ok(cache in (0, 1), "III.C", "root STE cache type %d" % cache)
        self.ok(self.u32(76) == 0, "III.C", "root STE reserved != 0")
        if cache == 1:
            # scratch caches the B-tree + heap addresses; they must agree
            # with the root object header's symbol table message (III.C)
            self.root_scratch = (self.u64(80), self.u64(88))
        else:
            self.root_scratch = None
        return root_oh

    # ---- level 1D: object headers v1 (spec IV.A.1.a) -----------------
    def object_header(self, addr, path):
        d = self.d
        self.ok(d[addr] == 1, "IV.A.1.a", "%s: object header version %d != 1" % (path, d[addr]))
        self.ok(d[addr + 1] == 0, "IV.A.1.a", "%s: OH reserved byte != 0" % path)
        nmsgs = self.u16(addr + 2)
        refcount = self.u32(addr + 4)
        hdrsize = self.u32(addr + 8)
        self.ok(refcount >= 1, "IV.A.1.a", "%s: refcount %d < 1" % (path, refcount))
        # v1 prefix is 12 bytes + 4 bytes padding so messages are 8-aligned
        pos = addr + 16
        self.claim(addr, addr + 16 + hdrsize, "OH %s" % path)
        consumed = 0
        msgs = []
        for i in range(nmsgs):
            mtype = self.u16(pos)
            msize = self.u16(pos + 2)
            mflags = d[pos + 4]
            self.ok(msize % 8 == 0, "IV.A.1.a",
                    "%s msg %d: size %d not a multiple of 8" % (path, i, msize))
            self.ok(mflags in (0, 1), "IV.A.1.a",
                    "%s msg %d: flags 0x%02x (subset: 0/constant)" % (path, i, mflags))
            self.ok(d[pos + 5] == 0 and d[pos + 6] == 0 and d[pos + 7] == 0,
                    "IV.A.1.a", "%s msg %d: reserved bytes != 0" % (path, i))
            msgs.append((mtype, pos + 8, msize))
            pos += 8 + msize
            consumed += 8 + msize
        self.ok(consumed == hdrsize, "IV.A.1.a",
                "%s: header size field %d != sum of messages %d" % (path, hdrsize, consumed))
        return msgs

    # ---- message bodies ----------------------------------------------
    def dataspace(self, off, size, path):
        """IV.A.2.b version 1: returns dims tuple (() = scalar)."""
        d = self.d
        self.ok(d[off] == 1, "IV.A.2.b", "%s: dataspace version %d != 1" % (path, d[off]))
        rank = d[off + 1]
        flags = d[off + 2]
        self.ok(flags == 0, "IV.A.2.b",
                "%s: dataspace flags 0x%02x (subset: no maxdims/perm)" % (path, flags))
        self.ok(d[off + 3] == 0 and self.u32(off + 4) == 0, "IV.A.2.b",
                "%s: dataspace reserved != 0" % path)
        self.ok(size >= 8 + 8 * rank, "IV.A.2.b",
                "%s: dataspace message too small for rank %d" % (path, rank))
        return tuple(self.u64(off + 8 + 8 * i) for i in range(rank))

    def datatype(self, off, path):
        """IV.A.2.d: returns element byte size. Classes 0/1/3 only."""
        d = self.d
        cls = d[off] & 0x0F
        ver = (d[off] >> 4) & 0x0F
        self.ok(ver == 1, "IV.A.2.d", "%s: datatype version %d != 1" % (path, ver))
        b0, b8, b16 = d[off + 1], d[off + 2], d[off + 3]
        size = self.u32(off + 4)
        if cls == 0:  # fixed-point
            self.ok((b0 & 0x01) == 0, "IV.A.2.d", "%s: fixed-point must be little-endian" % path)
            self.ok((b0 & 0x06) == 0, "IV.A.2.d", "%s: lo/hi pad bits set" % path)
            self.ok(b8 == 0 and b16 == 0, "IV.A.2.d", "%s: reserved class bits set" % path)
            self.ok(size in (1, 2, 4, 8), "IV.A.2.d", "%s: fixed-point width %d" % (path, size))
            bit_off = self.u16(off + 8)
            prec = self.u16(off + 10)
            self.ok(bit_off == 0, "IV.A.2.d", "%s: bit offset %d != 0" % (path, bit_off))
            self.ok(prec == 8 * size, "IV.A.2.d",
                    "%s: precision %d != %d" % (path, prec, 8 * size))
        elif cls == 1:  # floating-point
            self.ok((b0 & 0x41) == 0, "IV.A.2.d", "%s: float must be plain little-endian" % path)
            # mantissa normalization (bits 4-5) must be 2: implied MSB (IEEE)
            self.ok(((b0 >> 4) & 0x03) == 2, "IV.A.2.d",
                    "%s: mantissa normalization %d != 2 (implied-MSB IEEE)" % (path, (b0 >> 4) & 0x03))
            self.ok(size in (4, 8), "IV.A.2.d", "%s: float width %d" % (path, size))
            prec = self.u16(off + 10)
            exp_loc, exp_sz = d[off + 12], d[off + 13]
            man_loc, man_sz = d[off + 14], d[off + 15]
            bias = self.u32(off + 16)
            want = (32, 23, 8, 0, 23, 127) if size == 4 else (64, 52, 11, 0, 52, 1023)
            got = (prec, exp_loc, exp_sz, man_loc, man_sz, bias)
            self.ok(got == want, "IV.A.2.d",
                    "%s: IEEE float fields %s != %s" % (path, got, want))
            self.ok(b8 == (31 if size == 4 else 63), "IV.A.2.d",
                    "%s: sign bit location %d" % (path, b8))
        elif cls == 3:  # string
            self.ok((b0 & 0x0F) in (0, 1, 2), "IV.A.2.d", "%s: string padding type" % path)
            self.ok(((b0 >> 4) & 0x0F) == 0, "IV.A.2.d", "%s: string charset must be ASCII" % path)
            self.ok(size >= 1, "IV.A.2.d", "%s: zero-width string" % path)
        else:
            fail("IV.A.2.d", "%s: datatype class %d (subset: fixed/float/string)" % (path, cls))
        return size

    def attribute(self, off, size, path):
        """IV.A.2.m version 1."""
        d = self.d
        self.ok(d[off] == 1, "IV.A.2.m", "%s: attribute version %d != 1" % (path, d[off]))
        self.ok(d[off + 1] == 0, "IV.A.2.m", "%s: attribute reserved != 0" % path)
        name_sz = self.u16(off + 2)
        dt_sz = self.u16(off + 4)
        ds_sz = self.u16(off + 6)
        pad8 = lambda n: (n + 7) & ~7
        name_bytes = d[off + 8: off + 8 + name_sz]
        self.ok(name_bytes.endswith(b"\x00"), "IV.A.2.m",
                "%s: attribute name not null-terminated" % path)
        apath = "%s@%s" % (path, name_bytes[:-1].decode("ascii", "replace"))
        dt_off = off + 8 + pad8(name_sz)
        elem = self.datatype(dt_off, apath)
        ds_off = dt_off + pad8(dt_sz)
        dims = self.dataspace(ds_off, ds_sz, apath)
        npoints = 1
        for x in dims:
            npoints *= x
        data_off = ds_off + pad8(ds_sz)
        need = data_off - off + npoints * elem
        self.ok(need <= size, "IV.A.2.m",
                "%s: attribute value (%d bytes) overruns message (%d)" % (apath, need, size))

    # ---- level 1: groups (B-tree III.A.1, SNOD III.B, heap III.D) ----
    def heap(self, addr, path):
        d = self.d
        self.ok(d[addr:addr + 4] == b"HEAP", "III.D", "%s: bad local heap signature" % path)
        self.ok(d[addr + 4] == 0, "III.D", "%s: local heap version %d != 0" % (path, d[addr + 4]))
        self.ok(d[addr + 5:addr + 8] == b"\x00\x00\x00", "III.D", "%s: heap reserved != 0" % path)
        seg_size = self.u64(addr + 8)
        free_head = self.u64(addr + 16)
        data_addr = self.u64(addr + 24)
        # free list head: 1 = empty (libhdf5's H5HL_FREE_NULL convention,
        # the value the spec's "no free block" case is written as), else a
        # block offset within the segment
        self.ok(free_head == 1 or free_head == UNDEF or
                (free_head % 8 == 0 and free_head < seg_size), "III.D",
                "%s: free list head %d invalid for segment size %d" % (path, free_head, seg_size))
        self.claim(addr, addr + 32, "heap hdr %s" % path)
        self.claim(data_addr, data_addr + seg_size, "heap data %s" % path)
        return data_addr, seg_size

    def heap_name(self, data_addr, seg_size, name_off, path):
        self.ok(0 <= name_off < seg_size, "III.D",
                "%s: link name offset %d outside heap segment" % (path, name_off))
        end = self.d.index(b"\x00", data_addr + name_off)
        self.ok(end < data_addr + seg_size, "III.D",
                "%s: link name at %d not terminated inside heap" % (path, name_off))
        return self.d[data_addr + name_off:end]

    def group(self, btree_addr, heap_addr, path, from_scratch=None):
        self.groups += 1
        data_addr, seg_size = self.heap(heap_addr, path)
        if from_scratch is not None:
            self.ok(from_scratch == (btree_addr, heap_addr), "III.C",
                    "%s: STE scratch cache disagrees with symbol table message" % path)
        entries = []  # (name, oh_addr)

        def walk(node_addr, lo, hi, depth):
            d = self.d
            self.ok(d[node_addr:node_addr + 4] == b"TREE", "III.A.1",
                    "%s: bad B-tree signature at %d" % (path, node_addr))
            self.ok(d[node_addr + 4] == 0, "III.A.1",
                    "%s: B-tree node type %d != 0 (group)" % (path, d[node_addr + 4]))
            level = d[node_addr + 5]
            used = self.u16(node_addr + 6)
            # II.A: "Group Internal Node K" sizes every TREE node; the
            # leaf K governs SNODs (the B-tree's conceptual leaves), not
            # level-0 TREE nodes
            cap = 2 * self.internal_k
            self.ok(0 < used <= cap, "III.A.1",
                    "%s: B-tree entries used %d outside (0,%d]" % (path, used, cap))
            self.ok(depth < 64, "III.A.1", "%s: B-tree deeper than 64 (cycle?)" % path)
            node_size = 24 + (2 * self.internal_k + 1) * 8 + 2 * self.internal_k * 8
            self.claim(node_addr, node_addr + node_size, "btree %s" % path)
            # III.A.1: 2K+1 keys bracket 2K children; for group trees each
            # key is a heap offset of a link name, and key[i] <= all names
            # in child[i] <= key[i+1] (byte-lexicographic)
            pos = node_addr + 24
            prev_hi = lo
            for i in range(used):
                key_i = self.u64(pos + i * 16)
                child = self.u64(pos + i * 16 + 8)
                key_j = self.u64(pos + (i + 1) * 16)
                kname_i = self.heap_name(data_addr, seg_size, key_i, path)
                kname_j = self.heap_name(data_addr, seg_size, key_j, path)
                self.ok(kname_i <= kname_j, "III.A.1",
                        "%s: B-tree keys out of order (%r > %r)" % (path, kname_i, kname_j))
                if prev_hi is not None:
                    self.ok(prev_hi <= kname_i, "III.A.1",
                            "%s: B-tree key %r below previous bound %r" % (path, kname_i, prev_hi))
                prev_hi = kname_j
                if level > 0:
                    walk(child, kname_i, kname_j, depth + 1)
                else:
                    self.snod(child, data_addr, seg_size, kname_i, kname_j, path, entries)
            if hi is not None and prev_hi is not None:
                self.ok(prev_hi <= hi, "III.A.1",
                        "%s: rightmost key %r above parent bound %r" % (path, prev_hi, hi))

        walk(btree_addr, None, None, 0)
        # link names must be unique across the whole group
        names = [n for n, _ in entries]
        self.ok(len(names) == len(set(names)), "III.B",
                "%s: duplicate link names %s" % (path, sorted(set(n for n in names if names.count(n) > 1))))
        for name, oh in entries:
            self.visit(oh, "%s/%s" % (path, name.decode("ascii")))

    def snod(self, addr, heap_data, seg_size, lo, hi, path, entries):
        d = self.d
        self.ok(d[addr:addr + 4] == b"SNOD", "III.B", "%s: bad SNOD signature at %d" % (path, addr))
        self.ok(d[addr + 4] == 1, "III.B", "%s: SNOD version %d != 1" % (path, d[addr + 4]))
        self.ok(d[addr + 5] == 0, "III.B", "%s: SNOD reserved != 0" % path)
        nsym = self.u16(addr + 6)
        self.ok(0 < nsym <= 2 * self.leaf_k, "III.B",
                "%s: SNOD symbol count %d outside (0,%d]" % (path, nsym, 2 * self.leaf_k))
        self.claim(addr, addr + 8 + 2 * self.leaf_k * 40, "snod %s" % path)
        prev = None
        for i in range(nsym):
            e = addr + 8 + i * 40
            name_off = self.u64(e)
            oh_addr = self.u64(e + 8)
            cache = self.u32(e + 16)
            self.ok(cache in (0, 1, 2), "III.C", "%s: STE cache type %d" % (path, cache))
            self.ok(self.u32(e + 20) == 0, "III.C", "%s: STE reserved != 0" % path)
            name = self.heap_name(heap_data, seg_size, name_off, path)
            # III.B: "entries are sorted by link name"
            self.ok(prev is None or prev < name, "III.B",
                    "%s: SNOD entries not strictly sorted (%r !< %r)" % (path, prev, name))
            prev = name
            # the bracketing B-tree keys bound every name in this node
            if lo is not None:
                self.ok(lo <= name, "III.A.1",
                        "%s: name %r below left B-tree key %r" % (path, name, lo))
            if hi is not None:
                self.ok(name <= hi, "III.A.1",
                        "%s: name %r above right B-tree key %r" % (path, name, hi))
            entries.append((name, oh_addr))

    # ---- object dispatch ----------------------------------------------
    def visit(self, oh_addr, path):
        msgs = self.object_header(oh_addr, path)
        stab = None
        dims = None
        elem = None
        layout = None
        for mtype, off, size in msgs:
            if mtype == 0x0011:                       # symbol table (IV.A.2.r)
                stab = (self.u64(off), self.u64(off + 8))
            elif mtype == 0x0001:                     # dataspace
                dims = self.dataspace(off, size, path)
            elif mtype == 0x0003:                     # datatype
                elem = self.datatype(off, path)
            elif mtype == 0x0008:                     # layout (IV.A.2.i)
                self.ok(self.d[off] == 3, "IV.A.2.i",
                        "%s: layout version %d != 3" % (path, self.d[off]))
                self.ok(self.d[off + 1] == 1, "IV.A.2.i",
                        "%s: layout class %d != 1 (contiguous)" % (path, self.d[off + 1]))
                layout = (self.u64(off + 2), self.u64(off + 10))
            elif mtype == 0x000C:                     # attribute
                self.attribute(off, size, path)
            elif mtype == 0x0005:                     # fill value v2 (IV.A.2.f)
                v, alloc, when, defined = self.d[off], self.d[off + 1], self.d[off + 2], self.d[off + 3]
                self.ok(v == 2, "IV.A.2.f", "%s: fill value version %d != 2" % (path, v))
                self.ok(1 <= alloc <= 3, "IV.A.2.f", "%s: space allocation time %d" % (path, alloc))
                self.ok(0 <= when <= 2, "IV.A.2.f", "%s: fill write time %d" % (path, when))
                self.ok(defined in (0, 1), "IV.A.2.f", "%s: fill defined flag %d" % (path, defined))
            elif mtype == 0x0012:                     # mtime (IV.A.2.s)
                self.ok(self.d[off] == 1, "IV.A.2.s", "%s: mtime version != 1" % path)
            elif mtype == 0x0000:                     # NIL
                pass
            else:
                fail("IV.A.1.a", "%s: unsupported message type 0x%04x" % (path, mtype))
        if stab is not None:
            self.ok(dims is None and layout is None, "IV.A.2.r",
                    "%s: object is both group and dataset" % path)
            scratch = self.root_scratch if path == "" else None
            self.group(stab[0], stab[1], path, from_scratch=scratch)
        else:
            self.ok(dims is not None, "IV.A.2.b", "%s: dataset missing dataspace" % path)
            self.ok(elem is not None, "IV.A.2.d", "%s: dataset missing datatype" % path)
            self.ok(layout is not None, "IV.A.2.i", "%s: dataset missing layout" % path)
            addr, byte_size = layout
            npoints = 1
            for x in dims:
                npoints *= x
            # cross-check: contiguous byte size must equal the dataspace's
            # element count times the datatype's element size
            self.ok(byte_size == npoints * elem, "IV.A.2.i",
                    "%s: layout size %d != %d elements x %d bytes" % (path, byte_size, npoints, elem))
            if byte_size > 0:
                self.ok(addr != UNDEF, "IV.A.2.i", "%s: allocated dataset with undefined address" % path)
                self.claim(addr, addr + byte_size, "data %s" % path)
            self.datasets[path] = (addr, byte_size, dims, elem)

    # ---- global sweeps --------------------------------------------------
    def overlaps(self):
        ext = sorted(self.extents)
        for (s1, e1, l1), (s2, e2, l2) in zip(ext, ext[1:]):
            self.ok(e1 <= s2, "II.A",
                    "extents overlap: %s [%d,%d) vs %s [%d,%d)" % (l1, s1, e1, l2, s2, e2))

    def run(self):
        root = self.superblock()
        self.visit(root, "")
        self.overlaps()


def main(argv):
    quiet = "--quiet" in argv
    paths = [a for a in argv[1:] if not a.startswith("--")]
    if len(paths) != 1:
        print(__doc__)
        return 2
    with open(paths[0], "rb") as f:
        data = f.read()
    c = Checker(data, len(data))
    try:
        c.run()
    except H5Fail as e:
        print("h5check FAIL %s: %s" % (paths[0], e))
        return 1
    except Exception as e:
        print("h5check FAIL %s: malformed structure — %r" % (paths[0], e))
        return 1
    if not quiet:
        ds = "\n".join("  %s  dims=%s elem=%dB @%d+%d" % (p, list(d[2]), d[3], d[0], d[1])
                       for p, d in sorted(c.datasets.items()))
        print("h5check OK %s: %d checks, %d groups, %d datasets\n%s"
              % (paths[0], c.checks, c.groups, len(c.datasets), ds))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
