from . import datetime_utils, money, text  # noqa: F401
