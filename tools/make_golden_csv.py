#!/usr/bin/env python3
"""Regenerate src/test/resources/golden_output.csv by running the
REFERENCE's own stage-3 converter (jsontocsv_enhanced.create_csv_from_analyzed_json)
over its shipped analyzed.json. The fixture is reference-derived golden
output, not engine output — GoldenCsvSpec compares our CsvFlatten to it.

Usage: python3 tools/make_golden_csv.py
"""
import sys

sys.path.insert(0, "/root/reference")
from jsontocsv_enhanced import create_csv_from_analyzed_json

ok, n = create_csv_from_analyzed_json(
    "/root/reference/analyzed.json",
    "src/test/resources/golden_output.csv")
print(f"ok={ok} creators={n}")
