from .core import (  # noqa: F401
    Transform,
    aggregate,
    column_filter,
    filter_contains,
    filtered_transform,
    pipe,
    select_columns,
    split_into_words,
    transform_lower,
    transform_trim,
    transform_upper,
)
from .parser import create_operator, parse_command, parse_operation_string  # noqa: F401
