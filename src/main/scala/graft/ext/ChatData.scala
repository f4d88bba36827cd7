package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Instruction/chat-data preparation: structural validation of
  * role-tagged conversations and rendering into a single training
  * string. Conversations arrive as `array<struct<role, content>>`
  * (the universal interchange shape for SFT corpora); both operators
  * are narrow per-row HOF passes — zero shuffle, no UDFs, state
  * bounded by one conversation.
  */
object ChatData {

  /** Structural validation + stats for SFT conversations. A
    * conversation is `valid` iff: every role is system/user/assistant
    * with `system` only as a single optional head; the body after
    * that head STARTS with `user`, strictly ALTERNATES (adjacent
    * roles always differ), and ENDS with `assistant`; and no content
    * is blank. The five flags are emitted separately (a cleaning
    * pipeline routes on the failure kind), plus `n_turns` (system
    * excluded) and exact per-side char totals — the inputs of a
    * turn-balance / reply-length gate. ANSI-safe: array ends are read
    * with try_element_at, so empty conversations produce false flags,
    * never errors. */
  def chatValidate(convs: DataFrame, idCol: String = "conv_id",
                   msgsCol: String = "msgs"): DataFrame = {
    val msgs = col(msgsCol)
    val rs = transform(msgs, m => m.getField("role"))
    val hasSystem =
      coalesce(try_element_at(rs, lit(1)) === "system", lit(false))
    val body = when(hasSystem, slice(rs, lit(2), size(rs) - 1)).otherwise(rs)
    val n = size(body)
    val rolesOk = forall(rs, r => r.isin("system", "user", "assistant")) &&
      !exists(slice(rs, lit(2), greatest(size(rs) - 1, lit(0))),
        r => r === "system")
    val startsUser =
      coalesce(try_element_at(body, lit(1)) === "user", lit(false))
    val endsAssistant =
      coalesce(try_element_at(body, lit(-1)) === "assistant", lit(false))
    val alternates = n > 0 && forall(
      zip_with(slice(body, lit(1), greatest(n - 1, lit(0))),
        slice(body, lit(2), greatest(n - 1, lit(0))), (a, b) => a =!= b),
      x => x)
    val noBlank = forall(msgs, m => length(trim(m.getField("content"))) > 0)
    def sideChars(role: String): Column =
      aggregate(filter(msgs, m => m.getField("role") === role), lit(0L),
        (acc, m) => acc + length(m.getField("content")).cast("long"))
    convs.select(col(idCol),
      n.cast("long").as("n_turns"),
      hasSystem.as("has_system"),
      rolesOk.as("roles_ok"),
      startsUser.as("starts_user"),
      endsAssistant.as("ends_assistant"),
      alternates.as("alternates"),
      noBlank.as("no_blank"),
      sideChars("user").as("n_user_chars"),
      sideChars("assistant").as("n_assistant_chars"),
      (rolesOk && startsUser && endsAssistant && alternates && noBlank)
        .as("valid"))
  }

  /** Render a conversation to one training string with a generic
    * role-token template: each message becomes
    * `<|role|>\ncontent<|end|>\n` in order, and `addGenPrompt`
    * appends a trailing `<|assistant|>\n` generation prompt (the
    * inference-time form). Deterministic fold in message order;
    * output `(idCol, n_msgs, rendered)`. */
  def chatRender(convs: DataFrame, idCol: String = "conv_id",
                 msgsCol: String = "msgs",
                 addGenPrompt: Boolean = false): DataFrame = {
    val msgs = col(msgsCol)
    val body = aggregate(msgs, lit(""), (acc, m) =>
      concat(acc, lit("<|"), m.getField("role"), lit("|>\n"),
        m.getField("content"), lit("<|end|>\n")))
    val rendered =
      if (addGenPrompt) concat(body, lit("<|assistant|>\n")) else body
    convs.select(col(idCol), size(msgs).cast("long").as("n_msgs"),
      rendered.as("rendered"))
  }
}
