package graft.pipeline

/** The reference's fundamental row: a nullable (key, value) byte pair
  * (kafka_client.py:172-173, serializer 26-31).
  */
case class KafkaRecord(key: Array[Byte], value: Array[Byte])

/** User-extensibility point (reference transformer.py:2-8): a 1→0..n
  * row generator applied on reload — a typed flatMap, not a scalar UDF.
  * `id` participates in hot-reload state equality
  * (kafka_client.py:356,376).
  */
trait Transformer extends Serializable {
  def id: String
  def transform(r: KafkaRecord): Iterator[KafkaRecord]
}

/** Identity transformer (transformer.py:4-8): yields the row unchanged. */
class IdentityTransformer extends Transformer {
  override def id: String = "Identity"
  override def transform(r: KafkaRecord): Iterator[KafkaRecord] = Iterator.single(r)
}

object Transformer {
  /** Reflective loading (kafka_client.py:199-205): the reference takes
    * "module:Class"; here a fully-qualified class name with a no-arg
    * constructor, which must be on the executor classpath.
    */
  def load(className: String): Transformer =
    Class.forName(className).getDeclaredConstructor()
      .newInstance().asInstanceOf[Transformer]
}
