# Prototype for q_serde_errors: the error-taxonomy driver query.
#
# JVM side (FormatQueries.serdeErrors): each customer row is protobuf-encoded
# with the real wire encoders (field 1 varint c_custkey, field 2 string
# c_name), a deterministic fault is injected by c_custkey % 7
#   r == 3 -> an undeclared field number 9 appended  -> IllegalCellException
#             (descriptor decode with errorOnUnknownFields = true)
#   r == 5 -> field-1 tag + a dangling 0x80 varint continuation byte
#             -> ArrayIndexOutOfBoundsException in ByteReader.readVarLong,
#             wrapped as IllegalRowException(c_name * 20) -> exercises the
#             250-char trim250 echo discipline
# and the message is decoded through Protobuf.decodeWithDescriptor.
# Output: per error_kind -> n, msg_chars (sum of exception-message lengths),
# key_sum / name_chars (sums over successfully decoded rows only).
#
# This mirror rebuilds the exact exception messages in Python and checks the
# DuckDB SQL reproduces the aggregate, row for row.
import duckdb, sys

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
rows = con.execute(
    f"SELECT c_custkey, c_name FROM read_parquet('{sf}/customer.parquet')"
).fetchall()


def trim250(s):
    return s if len(s) <= 250 else s[:250] + "…"


CELL_MSG = ("illegal cell on field 'f9' with data "
            "[unknown field number 9 in message graftq.Cust]")

mirror = {}
for key, name in rows:
    r = key % 7
    if r == 3:
        kind, msg, k, nl = "illegal_cell", CELL_MSG, 0, 0
    elif r == 5:
        kind = "illegal_row"
        msg = "illegal row with data [" + trim250(name * 20) + "]"
        k, nl = 0, 0
    else:
        kind, msg, k, nl = "ok", "", key, len(name)
    agg = mirror.setdefault(kind, [0, 0, 0, 0])
    agg[0] += 1
    agg[1] += len(msg)
    agg[2] += k
    agg[3] += nl

SQL = """
WITH base AS (
  SELECT c_custkey, c_name,
    CASE WHEN c_custkey % 7 = 3 THEN 'illegal_cell'
         WHEN c_custkey % 7 = 5 THEN 'illegal_row'
         ELSE 'ok' END AS error_kind
  FROM customer)
SELECT error_kind,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CASE error_kind
    WHEN 'illegal_cell' THEN length('illegal cell on field ''f9'' with data [unknown field number 9 in message graftq.Cust]')
    WHEN 'illegal_row' THEN length('illegal row with data [') + (CASE WHEN length(c_name) * 20 <= 250 THEN length(c_name) * 20 ELSE 251 END) + 1
    ELSE 0 END) AS BIGINT) AS msg_chars,
  CAST(sum(CASE WHEN error_kind = 'ok' THEN c_custkey ELSE 0 END) AS BIGINT) AS key_sum,
  CAST(sum(CASE WHEN error_kind = 'ok' THEN length(c_name) ELSE 0 END) AS BIGINT) AS name_chars
FROM base
GROUP BY error_kind
ORDER BY error_kind
"""

con.execute(
    f"CREATE VIEW customer AS SELECT * FROM read_parquet('{sf}/customer.parquet')")
got = {r[0]: list(r[1:]) for r in con.execute(SQL).fetchall()}

ok = True
for kind in sorted(set(mirror) | set(got)):
    m, g = mirror.get(kind), got.get(kind)
    status = "PASS" if m == g else "FAIL"
    if m != g:
        ok = False
    print(f"{kind}: {status} mirror={m} sql={g}")
print("PROTO10 PASS" if ok else "PROTO10 FAIL")
sys.exit(0 if ok else 1)
