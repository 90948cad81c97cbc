from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from dataflow_mm_spark.operators.conversation import (
    assemble_messages,
    conversation_to_message_nested,
)


def test_assemble_messages_ordering_and_roles(spark, tiny_transcripts, tiny_pdf):
    out = assemble_messages(tiny_transcripts)
    rows = {r.conv_id: r for r in out.collect()}
    assert len(rows) == tiny_pdf.conv_id.nunique()
    for conv_id, g in tiny_pdf.groupby("conv_id"):
        msg = rows[conv_id].message
        assert msg[0].role == "system"
        body = msg[1:]
        expected = [
            (r.role, r.text.strip())
            for r in g.sort_values("turn_idx").itertuples()
            if r.text.strip()
        ]
        assert [(m.role, m.content) for m in body] == expected


def test_nested_conversation_to_message(spark):
    rows = [
        Row(
            conversation=[
                Row(**{"from": "human", "value": "<image>what is this?"}),
                Row(**{"from": "gpt", "value": "a cat"}),
                Row(**{"from": "human", "value": "<image><image>compare\n\n\nthese"}),
            ],
            image=["img0.jpg", "img1.jpg", "img2.jpg"],
            video=[],
            audio=[],
        ),
        # token/path mismatch: 1 token, 0 paths
        Row(
            conversation=[Row(**{"from": "human", "value": "<image>hi"})],
            image=[],
            video=[],
            audio=[],
        ),
    ]
    schema = (
        "conversation array<struct<from:string,value:string>>, "
        "image array<string>, video array<string>, audio array<string>"
    )
    df = spark.createDataFrame(rows, schema=schema)
    out = conversation_to_message_nested(df).collect()

    ok = out[0]
    assert not ok.message_error
    msg = ok.message
    assert [m.role for m in msg] == ["system", "user", "assistant", "user"]
    u1 = msg[1].content
    assert [(c.type, c.value) for c in u1] == [
        ("image", "img0.jpg"),
        ("text", "what is this?"),
    ]
    u2 = msg[3].content
    assert [(c.type, c.value) for c in u2] == [
        ("image", "img1.jpg"),
        ("image", "img2.jpg"),
        ("text", "compare\nthese"),
    ]

    bad = out[1]
    assert bad.message_error and bad.message is None


def test_nested_plan_has_no_python_udf(spark):
    df = spark.createDataFrame(
        [Row(conversation=[Row(**{"from": "human", "value": "x"})], image=[], video=[], audio=[])],
        schema=(
            "conversation array<struct<from:string,value:string>>, "
            "image array<string>, video array<string>, audio array<string>"
        ),
    )
    plan = (
        conversation_to_message_nested(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
