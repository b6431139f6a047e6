import os, sys, json, math
sys.path.insert(0, '/root/repo')
os.environ.setdefault('ORACLE_SF_DIR', '/root/repo/testdata_sf1')
SF = os.environ['ORACLE_SF_DIR']
import duckdb
from tools.check_oracle import norm_cell, TABLES
from opentelemetry_collector_contrib_spark.session import build_session
import __spark_entry__ as entrymod

spark = build_session(app_name='dbg', master='local[32]', shuffle_partitions=32)
qs = entrymod.queries(); oracles = entrymod.oracle_sql()
name = 'text_stats_suite'
sdf = qs[name](spark, SF)
srows = {r['doc_id']: r.asDict() for r in sdf.collect()}
print('spark rows', len(srows))

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
cur = con.execute(oracles[name])
cols = [d[0] for d in cur.description]
orows = {}
for row in cur.fetchall():
    d = dict(zip(cols, row)); orows[d['doc_id']] = d
print('oracle rows', len(orows))

ndiff = 0
for k in srows:
    s, o = srows[k], orows.get(k)
    if o is None:
        print('missing in oracle:', k); continue
    for c in s:
        if norm_cell(s[c]) != norm_cell(o.get(c)):
            ndiff += 1
            if ndiff <= 30:
                print(f'doc={k} col={c} spark={s[c]!r} oracle={o.get(c)!r}')
print('total cell diffs:', ndiff)
