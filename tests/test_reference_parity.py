"""End-to-end parity with the reference's own test suite, run through OUR
pipeline on the reference's OWN fixture data.

Transcribed cases (the node runtime can't execute the unbuilt reference, so
its mocha assertions serve as executable goldens):

- CSV dissolve on three fields:  /root/reference/test/dissolve-test.js:11-18
- polyline dissolve merge/ring:  /root/reference/test/dissolve-test.js:20-110
- six_counties polygon dissolve: /root/reference/test/dissolve-test.js:112-124
- dissolve calc= aggregation:    /root/reference/test/dissolve-test.js:126-143
- two_states shp x states.csv join: /root/reference/test/join-test.js:76-86
"""

import pytest
from pyspark.sql import functions as F

from mapshaper_spark.operators import attributes as A
from mapshaper_spark.operators import dissolve as D
from mapshaper_spark.operators import joins as J
from mapshaper_spark.operators import topology as TP
from mapshaper_spark.sources import delim as DL
from mapshaper_spark.sources import shapefile as SHP

REF = "/root/reference/test/test_data"


class TestCsvDissolve:
    def test_dissolve_three_fields(self, spark, tmp_path):
        # dissolve-test.js "dissolve CSV on three fields": 9 rows -> 6 groups
        csv = tmp_path / "in.csv"
        csv.write_text("id1,id2,id3\na,1,x\na,1,x\na,2,x\nb,1,x\nb,2,x\n"
                       "b,2,x\nc,2,x\na,1,y\na,1,y\n")
        df = DL.import_delim(spark, str(csv)).withColumn(
            A.ROW_IDX, F.monotonically_increasing_id())
        out = (D.dissolve_attributes(df, ["id1", "id2", "id3"],
                                     calc={"first_idx": ("min", A.ROW_IDX)})
               .orderBy("first_idx")
               .select("id1", "id2", "id3").collect())
        got = [(r.id1, r.id2, r.id3) for r in out]
        # reference output preserves first-occurrence order:
        assert got == [("a", 1, "x"), ("a", 2, "x"), ("b", 1, "x"),
                       ("b", 2, "x"), ("c", 2, "x"), ("a", 1, "y")]


class TestPolylineDissolveParity:
    def chains(self, spark, paths):
        arcs = spark.createDataFrame(
            [(i, [float(p[0]) for p in path], [float(p[1]) for p in path])
             for i, path in enumerate(paths)],
            "arc_id long, xs array<double>, ys array<double>")
        feats = spark.createDataFrame(
            [("g", [list(range(len(paths)))])],
            "grp string, parts array<array<int>>")
        rows = TP.dissolve_polylines(feats, arcs, "grp").collect()
        return [list(zip(r.xs, r.ys)) for r in rows]

    def assert_chain(self, got, expect):
        assert got == expect or got == expect[::-1]

    def test_multiple_segments_merge(self, spark):
        # dissolve-test.js "polyline test 1": 3 paths -> single line 0..4
        out = self.chains(spark, [
            [(1, 1), (0, 0)],
            [(1, 1), (2, 2), (3, 3)],
            [(4, 4), (3, 3)]])
        assert len(out) == 1
        self.assert_chain(out[0], [(0.0, 0.0), (1.0, 1.0), (2.0, 2.0),
                                   (3.0, 3.0), (4.0, 4.0)])

    def test_simple_ring_preserved(self, spark):
        # "polyline test 2": a closed ring stays one closed line
        out = self.chains(spark, [[(1, 1), (1, 0), (0, 1), (1, 1)]])
        assert len(out) == 1
        assert out[0][0] == out[0][-1]
        assert len(out[0]) == 4

    def test_split_ring_rejoined(self, spark):
        # "polyline test 3": two open halves rejoin into the closed ring
        out = self.chains(spark, [
            [(1, 1), (1, 0), (0, 0)],
            [(0, 0), (0, 1), (1, 1)]])
        assert len(out) == 1
        assert out[0][0] == out[0][-1]
        assert len(out[0]) == 5
        assert set(out[0]) == {(1.0, 1.0), (1.0, 0.0), (0.0, 0.0), (0.0, 1.0)}


class TestSixCountiesDissolve:
    def test_copy_and_sum_fields(self, spark):
        # dissolve-test.js "polygon test 1" golden:
        # {NAME:'District of Columbia', STATE_FIPS:'11',
        #  POP2000:1916238, MULT_RACE:76770}
        with open(f"{REF}/six_counties.shp", "rb") as f:
            shp = f.read()
        with open(f"{REF}/six_counties.dbf", "rb") as f:
            dbf = f.read()
        df = SHP.import_shapefile(spark, shp, dbf)
        out = D.dissolve_attributes(
            df.withColumn("__all", F.lit(1)), ["__all"],
            sum_fields=["POP2000", "MULT_RACE"],
            copy_fields=["NAME", "STATE_FIPS"], order_col="fid").collect()
        assert len(out) == 1
        r = out[0]
        assert r.NAME == "District of Columbia"
        assert r.STATE_FIPS == "11"
        assert int(r.POP2000) == 1916238
        assert int(r.MULT_RACE) == 76770


class TestDissolveCalcParity:
    def test_calc_vocabulary(self, spark):
        # dissolve-test.js "calc= option works"
        rows = [(200, 20000, "A", "Apple", 0),
                (400, 15000, "B", "Beet", 1),
                (600, 8000, "A", "Ant", 2)]
        df = spark.createDataFrame(
            rows, "POP int, INCOME int, GROUP string, NAME string, idx int")
        out = {r.GROUP: r for r in
               (df.groupBy("GROUP")
                .agg(F.transform(F.sort_array(F.collect_list(
                         F.struct("idx", F.col("INCOME").alias("v")))),
                         lambda s: s["v"]).alias("INCOMES"),
                     F.sum("POP").alias("TOTPOP"),
                     F.max("POP").alias("MAXPOP"),
                     F.min("POP").alias("MINPOP"),
                     F.count(F.lit(1)).alias("n"),
                     F.transform(F.sort_array(F.collect_list(
                         F.struct("idx", F.col("NAME").alias("v")))),
                         lambda s: s["v"]).alias("NAMES"))).collect()}
        a = out["A"]
        assert (list(a.INCOMES), a.TOTPOP, a.MAXPOP, a.MINPOP, a.n,
                list(a.NAMES)) == ([20000, 8000], 800, 600, 200, 2,
                                   ["Apple", "Ant"])
        b = out["B"]
        assert (list(b.INCOMES), b.TOTPOP, b.n) == ([15000], 400, 1)


class TestTwoStatesJoin:
    def test_shp_csv_attribute_join(self, spark):
        # join-test.js test1: two_states.shp joined with states.csv on
        # FIPS=STATE_FIPS (string), fields POP2010,SUB_REGION
        with open(f"{REF}/two_states.shp", "rb") as f:
            shp = f.read()
        with open(f"{REF}/two_states.dbf", "rb") as f:
            dbf = f.read()
        states = SHP.import_shapefile(spark, shp, dbf)
        csv = DL.import_delim(spark, f"{REF}/text/states.csv",
                              string_fields=["STATE_FIPS"])
        out = J.join_attributes(
            states, csv, ("FIPS", "STATE_FIPS"),
            copy_fields=["POP2010", "SUB_REGION"])
        got = {r.STATE_NAME: r for r in out.collect()}
        assert got["Oregon"].POP2010 == 3831074
        assert got["Oregon"].SUB_REGION == "Pacific"
        assert got["Oregon"].joins == 1
        assert got["Washington"].POP2010 == 6724540
        assert got["Washington"].SUB_REGION == "Pacific"
