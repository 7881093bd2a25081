

def test_teacher_module_renders_historic_literals():
    """BYTE-STABILITY pin for the r15 teacher consolidation
    (functions/teacher.py): the constants must render EXACTLY the
    historical literals, because classifier._Y_SQL feeds
    t_quality_logreg's registered oracle through _train_score_ctes and
    that row is not always inside the recording window — a careless
    constant edit must fail HERE, not silently re-window graded
    rows."""
    from knowledge_graph_system_spark.functions.teacher import (
        quality_sql_duck,
        teacher_expr_spark,
        teacher_sql_duck,
    )
    from knowledge_graph_system_spark.operators.classifier import (
        _Y_EXPR,
        _Y_SQL,
    )

    assert _Y_EXPR == (
        "round(0.5D * element_at(x, 3) + 0.5D * element_at(x, 2), 6) >= 0.65D"
    )
    assert _Y_SQL == "round(0.5 * x[3] + 0.5 * x[2], 6) >= 0.65"
    assert teacher_expr_spark("_ws") == (
        "round(0.5D * (size(array_distinct(_ws)) / cast(size(_ws) as double))"
        " + 0.5D * least(size(_ws) / 60.0D, 1.0D), 6) >= 0.65D"
    )
    assert teacher_sql_duck("ws") == (
        "round(0.5 * (len(list_distinct(ws)) / CAST(len(ws) AS DOUBLE))"
        " + 0.5 * least(len(ws) / 60.0, 1.0), 6) >= 0.65"
    )
    assert quality_sql_duck("w") == (
        "round(0.5 * (len(list_distinct(w)) / CAST(len(w) AS DOUBLE))"
        " + 0.5 * least(len(w) / 60.0, 1.0), 6)"
    )
