#!/usr/bin/env python3
"""One-shot generator for the committed shapefile fixtures
(src/test/resources/shapedata/*). Deterministic content; exercises the
Scala shapefile decoder's polygon ring-winding grouping (outer CW +
hole CCW + a second outer → MultiPolygon), multipart polylines, PointZ
(Z/M skipping), .dbf typed fields incl. a deleted record, and .prj
EPSG sniffing.

Tooling only: the library itself never uses Python — it reads the
committed artifacts with its own decoder.
"""
import os
import struct
import sys

OUT = sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/shapedata"


def shp_file(shape_type, records, bbox):
    """records: list of content-bytes (already including shape type)."""
    body = b""
    for i, content in enumerate(records):
        body += struct.pack(">ii", i + 1, len(content) // 2) + content
    total_words = (100 + len(body)) // 2
    header = struct.pack(">iiiiiii", 9994, 0, 0, 0, 0, 0, total_words)
    header += struct.pack("<ii", 1000, shape_type)
    header += struct.pack("<dddd", *bbox)
    header += struct.pack("<dddd", 0, 0, 0, 0)  # Z/M ranges
    return header + body


def rec_polygon(rings):
    n_points = sum(len(r) for r in rings)
    xs = [p[0] for r in rings for p in r]
    ys = [p[1] for r in rings for p in r]
    out = struct.pack("<i", 5)
    out += struct.pack("<dddd", min(xs), min(ys), max(xs), max(ys))
    out += struct.pack("<ii", len(rings), n_points)
    start = 0
    for r in rings:
        out += struct.pack("<i", start)
        start += len(r)
    for r in rings:
        for (x, y) in r:
            out += struct.pack("<dd", x, y)
    return out


def rec_polyline(parts):
    out = rec_polygon(parts)
    return struct.pack("<i", 3) + out[4:]


def rec_pointz(x, y, z, m):
    return struct.pack("<iddd d", 11, x, y, z, m)


def rec_null():
    return struct.pack("<i", 0)


def dbf_file(fields, rows, deleted=()):
    """fields: [(name, type, len, dec)]; rows: list of tuples of strings."""
    n, rec_size = len(rows), 1 + sum(f[2] for f in fields)
    header_size = 32 + 32 * len(fields) + 1
    out = struct.pack("<BBBBiHH20x", 3, 26, 8, 12, n, header_size, rec_size)
    for (name, ftype, flen, fdec) in fields:
        out += name.encode("ascii").ljust(11, b"\0") + ftype.encode("ascii")
        out += b"\0" * 4 + struct.pack("<BB", flen, fdec) + b"\0" * 14
    out += b"\x0d"
    for i, row in enumerate(rows):
        out += b"*" if i in deleted else b" "
        for (f, v) in zip(fields, row):
            s = str(v)
            out += (s.rjust(f[2]) if f[1] in "NF" else s.ljust(f[2]))[: f[2]].encode("ascii")
    return out + b"\x1a"


# clockwise square ring (outer) / counter-clockwise (hole)
def ring_cw(x0, y0, size):
    return [(x0, y0), (x0, y0 + size), (x0 + size, y0 + size), (x0 + size, y0), (x0, y0)]


def ring_ccw(x0, y0, size):
    return list(reversed(ring_cw(x0, y0, size)))


def main():
    os.makedirs(OUT, exist_ok=True)

    # --- districts.shp: polygons, winding cases, one null shape -------------
    recs = []
    for i in range(20):
        recs.append(rec_polygon([ring_cw(400000 + 100 * i, 6500000, 80)]))
    # record 21: outer + hole + second outer → MultiPolygon
    recs.append(rec_polygon([
        ring_cw(410000, 6510000, 100), ring_ccw(410030, 6510030, 20),
        ring_cw(410200, 6510000, 50)]))
    recs.append(rec_null())  # record 22: null shape
    with open(f"{OUT}/districts.shp", "wb") as f:
        f.write(shp_file(5, recs, (400000, 6500000, 412000, 6512000)))
    rows = [(f"district_{i:03d}", "URBAN" if i % 2 == 0 else "RURAL",
             str(6400 + i), "T" if i % 3 == 0 else "F") for i in range(22)]
    with open(f"{OUT}/districts.dbf", "wb") as f:
        f.write(dbf_file(
            [("NAME", "C", 24, 0), ("ZONE", "C", 8, 0),
             ("AREA_M2", "N", 12, 0), ("ACTIVE", "L", 1, 0)], rows))
    with open(f"{OUT}/districts.prj", "w") as f:
        f.write('PROJCS["SWEREF99 TM",GEOGCS["GCS_SWEREF99",DATUM["D_SWEREF99",'
                'SPHEROID["GRS_1980",6378137.0,298.257222101]],'
                'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433],'
                'AUTHORITY["EPSG",4619]],PROJECTION["Transverse_Mercator"],'
                'UNIT["Meter",1.0],AUTHORITY["EPSG","3006"]]')

    # --- sensors.shp: PointZ (Z/M skipped), deleted dbf record --------------
    recs = [rec_pointz(17.0 + i * 0.01, 59.0 + i * 0.01, 10.0 + i, float(i))
            for i in range(15)]
    with open(f"{OUT}/sensors.shp", "wb") as f:
        f.write(shp_file(11, recs, (17.0, 59.0, 17.2, 59.2)))
    rows = [(f"sensor_{i:02d}", str(100 + i)) for i in range(15)]
    with open(f"{OUT}/sensors.dbf", "wb") as f:
        f.write(dbf_file([("TAG", "C", 16, 0), ("CODE", "N", 6, 0)],
                         rows, deleted={4}))
    with open(f"{OUT}/sensors.prj", "w") as f:
        f.write('GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
                'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
                'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]')

    # --- routes.shp: multipart polyline, no .dbf / no .prj ------------------
    recs = [
        rec_polyline([[(0, 0), (10, 0), (10, 10)]]),
        rec_polyline([[(0, 0), (5, 5)], [(6, 6), (9, 9), (12, 9)]]),
    ]
    with open(f"{OUT}/routes.shp", "wb") as f:
        f.write(shp_file(3, recs, (0, 0, 12, 10)))

    for name in sorted(os.listdir(OUT)):
        print(name, os.path.getsize(os.path.join(OUT, name)))


if __name__ == "__main__":
    main()
