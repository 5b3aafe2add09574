#!/bin/bash
# Verify/Bench launcher with the JPMS --add-opens set Spark's own
# launcher scripts inject (java 17 strong encapsulation otherwise kills
# Kryo's reflective serializers — e.g. MLlib KMeans broadcasting a
# HeapByteBuffer in q55). Usage: run_verify.sh <sfDir> <outDir> [names...]
set -e
cd "$(dirname "$0")/.."
JAR=target/scala-2.13/marchmaniasparklakehousespark_2.13-0.1.0.jar
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
exec java -Xmx${VERIFY_XMX:-48g} $OPENS -cp "$JAR:/opt/spark/jars/*" graft.Verify "$@"
