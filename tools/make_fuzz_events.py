"""Adversarial events.parquet for cross-engine fuzzing of the
window/session/date queries (q03, q06, q10, q11, q14, q15, q38).

Usage:
  mkdir -p /tmp/fuzz_ev && cd /tmp/fuzz_ev
  for t in region nation customer supplier part orders lineitem documents \
      embeddings; do ln -sf /root/testdata/sf0.001/$t.parquet .; done
  python3 tools/make_fuzz_events.py
  sbt "runMain graft.Verify /tmp/fuzz_ev /tmp/fuzz_ev_out"
  python3 tools/oracle_check.py /tmp/fuzz_ev /tmp/fuzz_ev_out
"""
import random

import pyarrow as pa
import pyarrow.parquet as pq

random.seed(11)
NS = 10 ** 9
BASE = 1704067200 * NS  # 2024-01-01T00:00:00Z

rows = []


def add(ts_ns, user, etype, value, props):
    rows.append((len(rows), ts_ns, user, etype, value, props))


# user 1: EXACT 300s gaps (session boundary semantics) + sub-second nanos
t = BASE
for i in range(6):
    add(t, 1, "click", 1.25, '{"k": 1}')
    t += 300 * NS
add(t + 299 * NS + 999999999, 1, "view", 2.5, '{"k": 2}')  # just inside next gap

# user 2: duplicate timestamps (lag/rolling tie-break via event_id)
for i in range(4):
    add(BASE + 1000 * NS, 2, "view", float(i), '{"k": %d}' % i)

# user 3: midnight-crossing + end-of-day nanos (tsDate truncation)
add(BASE - 1, 3, "error", -5.5, "{}")                      # 2023-12-31T23:59:59.999999999
add(BASE, 3, "error", 0.0, "no digits here")
add(BASE + 86399 * NS + 999999999, 3, "purchase", 1e6, '{"k": 99}')
add(BASE + 86400 * NS, 3, "signup", -0.0, '{"k": 007}')

# user 4: single event
add(BASE + 12345 * NS + 678901234, 4, "click", 3.75, '{"k": 42}')

# user 21: PRE-EPOCH events (1969) — day buckets are NEGATIVE here, so
# floor-vs-truncate day bucketing diverges (Spark DIV truncates toward
# zero, DuckDB // floors): these rows gate the engine's floorDivLit fix
# and keep the whole event tier honest on the negative time range.
add(-2 * 86400 * NS + 3600 * NS, 21, "click", -1.5, '{"k": -1}')
add(-1 * 86400 * NS + 7200 * NS, 21, "view", 0.5, '{"k": -2}')
add(-3600 * NS, 21, "purchase", 2.5, '{"k": -3}')   # late on day -1
add(3600 * NS, 21, "signup", 1.0, '{"k": -4}')      # early on day 0

# filler: random users/types/gaps including more exact-gap ties
for i in range(500):
    user = random.randint(5, 20)
    gap = random.choice([1, 60, 299, 300, 301, 3600])
    add(BASE + (i * gap % 200000) * NS + random.randint(0, NS - 1),
        user, random.choice(["click", "view", "signup", "error", "purchase"]),
        round(random.uniform(-100, 100), 2), '{"k": %d}' % random.randint(0, 99))

rows.sort(key=lambda r: r[1])
rows = [(i,) + r[1:] for i, r in enumerate(rows)]
tbl = pa.table({
    "event_id": pa.array([r[0] for r in rows], pa.int64()),
    "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
    "user_id": pa.array([r[2] for r in rows], pa.int64()),
    "event_type": pa.array([r[3] for r in rows], pa.string()),
    "value": pa.array([r[4] for r in rows], pa.float64()),
    "props": pa.array([r[5] for r in rows], pa.string()),
})
pq.write_table(tbl, "/tmp/fuzz_ev/events.parquet")
print("fuzz events:", len(rows))
