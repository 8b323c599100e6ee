"""No oracle-bearing gate query may return an EMPTY result at the driver's
gate scale (sf0.01): a 0-row Spark result hash-matches a 0-row oracle, so
the gate passes vacuously and verifies nothing.  q50 (dead nation pair),
q53 (non-scale-free fraction) and q45 (every small-scale customer has
orders) each shipped that way before this net existed.

DuckDB-only on purpose: if the oracle is nonempty and the engine
hash-matches it (the compare tests / driver gate), the engine result is
nonempty too -- so one cheap DuckDB pass per oracle suffices.
"""

from __future__ import annotations

import duckdb
import pytest

GATE_SF_DIR = "/root/testdata/sf0.01"

#: Oracles whose DuckDB runtime is large enough to dominate the suite; each
#: is known-nonempty at sf0.01 via its compare test.
HEAVY = {"dedup_embedding_lsh"}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute("SET threads TO 8")
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{GATE_SF_DIR}/{t}.parquet'"
        )
    yield c
    c.close()


def test_every_oracle_nonempty_at_gate_scale(con):
    from flatterer_spark.registry import all_oracles

    empties = []
    for name, sql in all_oracles().items():
        if name in HEAVY:
            continue
        if len(con.execute(sql).fetchall()) == 0:
            empties.append(name)
    assert not empties, f"vacuously-passing (empty) gate oracles: {empties}"
