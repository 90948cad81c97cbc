"""Canonical schemas.

The transcript schema is fixed by the engine contract (BASELINE.json
``input_hint``): one row per conversation turn. The reference's dynamic
string-keyed pandas columns (``dataflow/utils/storage.py``) are replaced by an
explicit StructType so Catalyst can prune/push down and the Iceberg-style sink
can partition on ``days(ts) / bucket(conv_id)``.
"""

from __future__ import annotations

from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

# Output of conversation_to_message (reference: Conversation2Message,
# dataflow/operators/conversations/format/conversation_to_message.py:49-104):
# one row per conversation with the assembled `message` array.
MESSAGE_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("role", T.StringType(), False),
            T.StructField("content", T.StringType(), True),
        ]
    )
)

# Quality struct produced by the 15-rule text-quality scorer (reference:
# RuleBaseFilter, dataflow/operators/core_vision/filter/rule_base_filter.py).
QUALITY_RULE_NAMES = [
    "colon_end",
    "ellipsis_ratio",
    "mean_word_len",
    "symbol_ratio",
    "html_entity",
    "idcard",
    "no_punc_span",
    "special_char",
    "watermark",
    "curly_ratio",
    "caps_ratio",
    "lorem_ipsum",
    "unique_ratio",
    "bullet_ratio",
    "javascript",
]
