#!/bin/bash
# Plain-java launcher for graft mains (avoids sbt lock/startup):
#   tools/run_main.sh graft.Verify /root/testdata/sf0.01 /tmp/out
# Classpath: compiled classes + Spark's bundled jars (build.sbt unmanagedBase)
# + test-classes for the dev profiling mains + scalatest from coursier cache.
CP="/root/repo/target/scala-2.13/classes:/root/repo/target/scala-2.13/test-classes"
CP="$CP:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ST=$(find /root/.cache/coursier -name "scalatest*_2.13*.jar" 2>/dev/null | tr '\n' ':')
SC=$(find /root/.cache/coursier -name "scalactic*_2.13*.jar" 2>/dev/null | tr '\n' ':')
CP="$CP:$ST$SC"
exec java \
  --add-opens java.base/java.lang=ALL-UNNAMED \
  --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens java.base/java.io=ALL-UNNAMED \
  --add-opens java.base/java.net=ALL-UNNAMED \
  --add-opens java.base/java.nio=ALL-UNNAMED \
  --add-opens java.base/java.util=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens java.base/sun.security.action=ALL-UNNAMED \
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-32g}" \
  -cp "$CP" "$@"
