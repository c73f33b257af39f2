#!/bin/bash
cd "$(dirname "$0")"
exec python -m pytest -p refshim_plugin /root/reference/python/tests/ \
  -q -p no:cacheprovider \
  --deselect /root/reference/python/tests/test_memory.py \
  "$@"
