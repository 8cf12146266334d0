from ipes_data_pipeline_spark.plans.inspect import (  # noqa: F401
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pruned_columns,
    assert_pushed_filters,
    formatted_plan,
    global_window_violations,
    has_operator,
)
