"""Full 29-area reference-fixture parity sweep → FIXTURES_PARITY.md.

Usage: PYTHONPATH=. python scripts/reference_parity.py [area ...]
"""

import json
import sys

sys.path.insert(0, ".")

from osm2streets_spark.session import get_spark
from osm2streets_spark.plans.parity import (
    run_reference_parity, write_parity_report,
)


def main():
    spark = get_spark()
    areas = sys.argv[1:] or None
    res = run_reference_parity(spark, areas)
    n = write_parity_report(res, "FIXTURES_PARITY.md")
    json.dump(res, open("FIXTURES_PARITY.json", "w"), indent=1,
              sort_keys=True)
    print(f"PASS {n}/{len(res)} — FIXTURES_PARITY.md written")


if __name__ == "__main__":
    main()
