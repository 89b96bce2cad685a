CREATE TABLE IF NOT EXISTS mikrotik_logs (
  `Timestamp` DateTime64(6),
  `Device` String,
  `Severity` Enum8('emergency' = 0, 'alert' = 1, 'critical' = 2, 'error' = 3, 'warning' = 4, 'notice' = 5, 'info' = 6, 'debug' = 7),
  `Categories_json` String,
  `Categories` Array(String) MATERIALIZED JSONExtract(Categories_json, 'Array(String)'),
  `Message` String
) ENGINE = MergeTree
PARTITION BY toDate(Timestamp)
ORDER BY (Device, Timestamp);

INSERT INTO mikrotik_logs (`Timestamp`, `Device`, `Severity`, `Categories_json`, `Message`) VALUES (?, ?, ?, ?, ?);
