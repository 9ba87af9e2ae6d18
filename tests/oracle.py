"""Re-export of the pure-pandas reference oracle.

The oracle moved into the package (data_quality_check_spark/oracle.py)
in round 3 so the expected-label fixture generator
(data_quality_check_spark/oracle_fixtures.py) can import it without
reaching into tests/; this shim keeps the historical
`from tests.oracle import evaluate` import path working.  The
no-Spark-imports invariant and the shared-kernel contract travel with
the module.
"""

from data_quality_check_spark.oracle import evaluate  # noqa: F401
