"""Arrow-vectorized pandas UDFs for the registered-UDF surface.

NO ``from __future__ import annotations`` here: pandas_udf resolves the
type hints at decoration time, and PEP-563 stringified hints break it.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def make_cosine_to_const_udf(qv_list):
    """Build a @pandas_udf computing cosine(embedding, qv) batch-at-a-
    time (one numpy matmul per Arrow batch)."""
    qv = np.array(qv_list, dtype=np.float64)
    qn = np.linalg.norm(qv)

    @pandas_udf(DoubleType())
    def cos_to_q(col: pd.Series) -> pd.Series:
        x = np.stack(col.to_numpy()).astype(np.float64)
        return pd.Series((x @ qv) / (np.linalg.norm(x, axis=1) * qn))

    return cos_to_q
