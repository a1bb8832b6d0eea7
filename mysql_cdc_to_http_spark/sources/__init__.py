"""Sources & sinks: CDC change-event feed (file-based Debezium-style
JSON), queue directory, HTTP sink."""
