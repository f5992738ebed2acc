#!/usr/bin/env python3
"""One-shot generator for the committed GeoPackage fixture
(src/test/resources/sample.gpkg). Deterministic content; exercises the
Scala SQLite reader's interior pages (enough rows to overflow one leaf),
payload-overflow chains (one long text attribute), rowid-alias PKs, and
both polygon and point GPKG geometry blobs.

Tooling only: the library itself never uses Python — it reads the
committed artifact with its own SQLite walker.
"""
import os
import sqlite3
import struct
import sys

OUT = sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/sample.gpkg"


def wkb_point(x, y):
    return struct.pack("<BIdd", 1, 1, x, y)


def wkb_polygon(rings):
    out = struct.pack("<BII", 1, 3, len(rings))
    for r in rings:
        out += struct.pack("<I", len(r))
        for (x, y) in r:
            out += struct.pack("<dd", x, y)
    return out


def gpkg_blob(wkb, srid=3006):
    # magic GP, version 0, flags 0b00000001 (LE header, no envelope)
    return b"GP" + bytes([0, 1]) + struct.pack("<i", srid) + wkb


def main():
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    if os.path.exists(OUT):
        os.remove(OUT)
    con = sqlite3.connect(OUT)
    cur = con.cursor()
    cur.execute("PRAGMA page_size = 1024")  # small pages -> interior nodes
    cur.execute("""CREATE TABLE gpkg_spatial_ref_sys (
        srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
        organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
        definition TEXT NOT NULL, description TEXT)""")
    cur.execute("INSERT INTO gpkg_spatial_ref_sys VALUES ('SWEREF99 TM', 3006, 'EPSG', 3006, 'undefined', NULL)")
    cur.execute("""CREATE TABLE gpkg_contents (
        table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,
        identifier TEXT UNIQUE, description TEXT DEFAULT '',
        last_change DATETIME, min_x DOUBLE, min_y DOUBLE,
        max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)""")
    cur.execute("""CREATE TABLE gpkg_geometry_columns (
        table_name TEXT NOT NULL, column_name TEXT NOT NULL,
        geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
        z TINYINT NOT NULL, m TINYINT NOT NULL,
        CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))""")

    cur.execute("""CREATE TABLE parks (
        fid INTEGER PRIMARY KEY, name TEXT, category TEXT,
        area_m2 REAL, protected INTEGER, notes TEXT, geom BLOB)""")
    cur.execute("INSERT INTO gpkg_contents VALUES ('parks','features','parks','', NULL, NULL,NULL,NULL,NULL, 3006)")
    cur.execute("INSERT INTO gpkg_geometry_columns VALUES ('parks','geom','POLYGON',3006,0,0)")
    for i in range(120):
        x0, y0 = 400000.0 + i * 100, 6500000.0 + (i % 7) * 50
        ring = [(x0, y0), (x0 + 80, y0), (x0 + 80, y0 + 60), (x0, y0 + 60), (x0, y0)]
        notes = ("boundary revision pending " * 200) if i == 17 else f"note-{i}"
        cur.execute(
            "INSERT INTO parks (name, category, area_m2, protected, notes, geom) VALUES (?,?,?,?,?,?)",
            (f"park_{i:03d}", ["nature", "urban", "reserve"][i % 3],
             80.0 * 60.0 + i, i % 2, notes,
             gpkg_blob(wkb_polygon([ring]))))

    cur.execute("""CREATE TABLE stations (
        fid INTEGER PRIMARY KEY, name TEXT, kind TEXT, elevation REAL, geom BLOB)""")
    cur.execute("INSERT INTO gpkg_contents VALUES ('stations','features','stations','', NULL, NULL,NULL,NULL,NULL, 3006)")
    cur.execute("INSERT INTO gpkg_geometry_columns VALUES ('stations','geom','POINT',3006,0,0)")
    for i in range(40):
        cur.execute(
            "INSERT INTO stations (name, kind, elevation, geom) VALUES (?,?,?,?)",
            (f"station_{i:02d}", ["rail", "bus"][i % 2], 10.0 + i,
             gpkg_blob(wkb_point(405000.0 + i * 10, 6501000.0 + i * 5))))

    con.commit()
    con.close()
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")


if __name__ == "__main__":
    main()
