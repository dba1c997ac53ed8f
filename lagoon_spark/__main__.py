"""``python -m lagoon_spark`` — the command-line entry point."""

from lagoon_spark.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
