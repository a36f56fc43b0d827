"""pyarrow-native scalar UDFs (Spark 4.1 ``@arrow_udf``).

Deliberately NO ``from __future__ import annotations`` here: arrow_udf
resolves the eval type from the function's type hints at decoration
time, and stringified hints ('pa.Array') raise UNSUPPORTED_SIGNATURE.
"""

import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql.functions import arrow_udf
from pyspark.sql.types import DoubleType


@arrow_udf(DoubleType())
def net_price(price: pa.Array, disc: pa.Array) -> pa.Array:
    """price * (1 - disc), computed entirely in pyarrow compute — the
    lane stays columnar with no pandas materialization (the step
    ``@pandas_udf`` pays on both sides of user code)."""
    return pc.multiply(price, pc.subtract(pa.scalar(1.0), disc))
