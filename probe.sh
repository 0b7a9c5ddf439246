#!/bin/bash
CORES=$1; REPL=$2; shift 2
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
HEAP=12  # equal-absolute 12g at every level: GC-fraction-fair + under the host page-zeroing cliff (see Bench.scala heapG)
PIN_FROM=${PIN_FROM:-0}
exec taskset -c $PIN_FROM-$((PIN_FROM+CORES-1)) java $OPENS -Xmx${HEAP}g -Xms${HEAP}g -Xmn$((HEAP/2))g -XX:+UseParallelGC -XX:ParallelGCThreads=$CORES -XX:+AlwaysPreTouch -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.tools.ProbePipeline $CORES $REPL "$@"
