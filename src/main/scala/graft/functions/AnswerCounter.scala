package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregator — the Spark-native surface for the reference's
  * UDAF pair (QuestionAnswerInitializer.java:37-48 = `zero`,
  * QuestionAnswerCounter.java:33-45 = `reduce`; `merge` has no reference
  * analog because Kafka Streams folds are single-threaded per key — Spark's
  * partial aggregation requires it and gets commutative/associative merge).
  *
  * Counts correct attempts and tracks the latest attempt time per key,
  * producing the reference's achievement-record shape.
  */
object AnswerCounter {

  case class AttemptIn(user_id: Long, correct: Boolean, ts_us: Long)
  case class CounterBuf(count: Long, latestUs: Long)
  case class AchievementRecord(userId: Long, achievementType: String,
                               count: Long, latestAttemptUs: Long)

  val agg: Aggregator[AttemptIn, CounterBuf, CounterBuf] =
    new Aggregator[AttemptIn, CounterBuf, CounterBuf] {
      override def zero: CounterBuf = CounterBuf(0L, Long.MinValue)
      override def reduce(b: CounterBuf, a: AttemptIn): CounterBuf =
        if (a.correct) CounterBuf(b.count + 1, math.max(b.latestUs, a.ts_us))
        else CounterBuf(b.count, math.max(b.latestUs, a.ts_us))
      override def merge(x: CounterBuf, y: CounterBuf): CounterBuf =
        CounterBuf(x.count + y.count, math.max(x.latestUs, y.latestUs))
      override def finish(r: CounterBuf): CounterBuf = r
      override def bufferEncoder: Encoder[CounterBuf] = Encoders.product[CounterBuf]
      override def outputEncoder: Encoder[CounterBuf] = Encoders.product[CounterBuf]
    }
}
