#!/usr/bin/env bash
# Build the native tokenizer hot loop.
set -euo pipefail
cd "$(dirname "$0")"
gcc -O3 -shared -fPIC -o libfasttok.so fasttok.c
echo "built $(pwd)/libfasttok.so"
