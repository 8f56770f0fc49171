#!/bin/bash
# Patch the fork-broken GET_VALUE macro in ORBextractor.cc (study comments
# were added AFTER line-continuation backslashes, which is invalid C++).
# Writes the fixed copy into the build dir; /root/reference stays untouched.
set -e
mkdir -p "$2"
sed -E 's@\\[[:space:]]+//.*$@\\@' "$1/src/ORBextractor.cc" > "$2/ORBextractor.cc"
