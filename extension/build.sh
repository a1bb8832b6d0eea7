#!/bin/sh
# Offline build: compiles the Catalyst extension against the local Spark
# distribution's jars (no network, no sbt resolution) and packages
# spark-graft-extension.jar next to this script.
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
SPARK_JARS="${SPARK_JARS:-$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "jars"))')}"
OUT="$HERE/classes"
rm -rf "$OUT" && mkdir -p "$OUT"
java -cp "$SPARK_JARS/scala-compiler-2.13.17.jar:$SPARK_JARS/scala-library-2.13.17.jar:$SPARK_JARS/scala-reflect-2.13.17.jar" \
  scala.tools.nsc.Main \
  -classpath "$SPARK_JARS/*" \
  -d "$OUT" \
  "$HERE"/src/sparkgraft/*.scala
jar cf "$HERE/spark-graft-extension.jar" -C "$OUT" .
echo "built $HERE/spark-graft-extension.jar"
