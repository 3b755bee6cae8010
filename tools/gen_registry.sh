#!/bin/sh
# Regenerate the mechanical registry table in SURVEY.md §2.9 from
# SparkEntry.registry (r13 ask #7). RegistryTableSpec fails the build
# when the committed table drifts from the code.
cd "$(dirname "$0")/.." || exit 1
exec sbt -batch "runMain graft.RegistryDump SURVEY.md"
