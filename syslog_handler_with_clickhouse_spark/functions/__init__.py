from .parse import parse_syslog_columns, parsed_logs  # noqa: F401
