package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RAG prompt assembly — the reference's implied-but-never-called
  * surface (`src/rag/prompt_template.rs:10-26` builds a llama3 chat
  * template; `src/rag/questions.rs:1-5` stubs a question list; neither
  * is reachable from main). Implemented as declarative string
  * construction over a retrieved context DataFrame.
  */
object RagPrompt {

  /** The reference's system prompt verbatim
    * (`src/rag/prompt_template.rs:12-13`). */
  val SystemPrompt: String =
    "You are a friendly and useful Chatbot. Be of assistance the best you can.\n"

  /** llama3 chat-template wrapper of one user message — faithful to
    * `prompt_template.rs:15-26` (leading newline, blank lines between
    * turns, trailing assistant header with no eot). */
  def llama3(userMessage: Column): Column =
    concat(
      lit("\n<|begin_of_text|>\n<|start_header_id|>system<|end_header_id|>\n"),
      lit(SystemPrompt),
      lit("<|eot_id|>\n\n<|start_header_id|>user<|end_header_id|>\n"),
      userMessage,
      lit("<|eot_id|>\n\n<|start_header_id|>assistant<|end_header_id|>"))

  /** RAG user message: question + one retrieved context passage (the
    * per-row form — rank-ordered rows, one prompt per context row, so
    * assembly needs no order-sensitive aggregation). */
  def contextMessage(question: String, context: Column): Column =
    concat(lit(question), lit("\n\nContext:\n"), context)

  /** Assemble prompts for the top-k context rows of `retrieved`
    * (already ranked): adds a `prompt` column. */
  def prompts(retrieved: DataFrame, question: String, textCol: String): DataFrame =
    retrieved.withColumn("prompt",
      llama3(contextMessage(question, col(textCol))))
}
