import duckdb, json, glob, sys
import pyarrow.parquet as pq
sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracle = json.load(open(f'{out}/oracle_sql.json'))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetch_arrow_table()
        files = glob.glob(f'{out}/{name}/*.parquet')
        got = pq.read_table(files[0]) if files else None
        if got is None:
            print(f'{name}: NO SPARK OUTPUT'); fail += 1; continue
        # sort columns by name (driver semantics)
        expc = {c.lower(): exp.column(c).to_pylist() for c in exp.column_names}
        gotc = {c.lower(): got.column(c).to_pylist() for c in got.column_names}
        if sorted(expc) != sorted(gotc):
            print(f'{name}: SCHEMA MISMATCH exp={sorted(expc)} got={sorted(gotc)}'); fail += 1; continue
        if exp.num_rows != got.num_rows:
            print(f'{name}: ROWS exp={exp.num_rows} got={got.num_rows}'); fail += 1; continue
        bad = None
        for c in sorted(expc):
            e, g = expc[c], gotc[c]
            for i, (a, b) in enumerate(zip(e, g)):
                if a != b and str(a) != str(b):
                    if isinstance(a, float) and isinstance(b, float) and abs(a-b) < 1e-9: continue
                    bad = (c, i, a, b); break
            if bad: break
        if bad:
            print(f'{name}: VALUE MISMATCH col={bad[0]} row={bad[1]} exp={bad[2]!r} got={bad[3]!r}'); fail += 1
        else:
            print(f'{name}: OK ({exp.num_rows} rows)'); ok += 1
    except Exception as ex:
        print(f'{name}: ERROR {ex}'); fail += 1
print(f'--- {ok} ok, {fail} fail')
